package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation: token statistics,
  * language id, quality scoring, fingerprinting. All integer/string
  * arithmetic (ratios as integer parts-per-thousand) so results are
  * engine- and partitioning-independent. Narrow per-row transforms — no
  * shuffle at all except where a groupBy is inherent. */
object TextAnalysis {

  /** Per-doc token statistics. */
  def tokenStats(df: DataFrame, content: Column, id: Column): DataFrame = {
    val w = Text.words(content)
    df.select(
      id.as("doc_id"),
      length(content).as("n_chars"),
      size(Text.tokens(content)).as("n_tokens"),
      size(w).as("n_words"),
      size(array_distinct(w)).as("n_uniq_words"),
      aggregate(w, lit(0L), (acc, x) => acc + length(x)).as("sum_word_len"))
  }

  private val stop = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "du"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "von", "mit"))

  private def hits(wordsCol: Column, lang: String): Column =
    size(filter(wordsCol, w => w.isInCollection(stop(lang))))

  /** Stopword-profile language id (n-gram-heuristic class). Deterministic
    * argmax with fixed tiebreak order en > es > fr > de. */
  def langId(df: DataFrame, content: Column, id: Column): DataFrame = {
    val w = Text.words(lower(content))
    val (en, es, fr, de) =
      (hits(w, "en"), hits(w, "es"), hits(w, "fr"), hits(w, "de"))
    df.select(id.as("doc_id"), en.as("s_en"), es.as("s_es"),
        fr.as("s_fr"), de.as("s_de"))
      .withColumn("lang_pred",
        when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr")
          && col("s_en") >= col("s_de"), "en")
          .when(col("s_es") >= col("s_fr") && col("s_es") >= col("s_de"), "es")
          .when(col("s_fr") >= col("s_de"), "fr")
          .otherwise("de"))
  }

  /** Quality signals + a boolean verdict. Ratios are integer
    * parts-per-thousand (exact integer division — portable). */
  def qualityScore(df: DataFrame, content: Column, id: Column): DataFrame = {
    val w = Text.words(lower(content))
    val nPunct = size(Text.tokens(content)) - size(
      filter(Text.tokens(content), t => t.rlike("^[0-9A-Za-z_]+$")))
    df.select(
        id.as("doc_id"),
        length(content).as("n_chars"),
        size(w).as("n_words"),
        hits(w, "en").as("__stop"),
        nPunct.as("__punct"),
        size(Text.tokens(content)).as("__toks"),
        size(array_distinct(w)).as("__uniq"),
        aggregate(w, lit(0L), (a, x) => greatest(a, length(x).cast("long")))
          .as("max_word_len"))
      // ratios in integer parts-per-thousand: `div` (exact integral
      // division) rather than `/` (double), so both engines agree.
      .selectExpr("doc_id", "n_chars", "n_words",
        "__stop * 1000L div n_words as stop_pm",
        "__punct * 1000L div __toks as punct_pm",
        "__uniq * 1000L div n_words as uniq_pm",
        "max_word_len",
        "n_chars >= 20 and n_words >= 5 and max_word_len <= 40 " +
          "and __uniq * 1000L div n_words >= 200 as quality_ok")
  }

  /** Document fingerprints: md5 of whitespace-normalized lowercase text
    * (exact content identity modulo spacing) + winnowing-style min
    * shingle hash (robust to local edits). */
  def fingerprint(df: DataFrame, content: Column, id: Column,
                  k: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val norm = regexp_replace(lower(trim(content)), " +", " ")
    df.select(
      id.as("doc_id"),
      md5(norm).as("content_fp"),
      // native one-pass min-of-md5 (graft.functions.MinMd5) — same value
      // as array_min(transform(.., md5)) without the per-element hex
      // string allocation of the interpreted HOF chain
      call_function("min_md5", Text.shingles(content, k)).as("winnow_fp"))
  }
}
