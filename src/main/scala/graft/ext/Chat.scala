package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}

/** Conversation (SFT/chat) data curation — the validation and
  * flattening passes an instruction-tuning pipeline runs over
  * role/content message arrays before tokenization: structural parse
  * with quarantine, role-sequence validation, per-conversation stats,
  * and the template render that turns a conversation into the plain
  * text the tokenizer/packing stages consume.
  */
object Chat {

  /** The wire schema: a JSON array of `{"role": …, "content": …}`. */
  val MessageSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("role", StringType), StructField("content", StringType))))

  /** Parse + validate one JSON conversation column. Malformed JSON
    * quarantines (`parse_ok = false`, stats null) rather than erroring
    * — the corpus-reader contract. Validation is structural, not
    * semantic: `alternation_ok` is false iff any two CONSECUTIVE
    * messages share a role (covers the doubled-user and
    * assistant-first-after-system defects the SFT trainers reject).
    *
    * A pure narrow projection — `from_json` plus array HOFs inside
    * whole-stage codegen, zero shuffles, scan-speed at any corpus
    * size. Output: (doc_id, parse_ok, n_turns, n_user, n_asst,
    * has_system, alternation_ok, content_chars, render_fp) —
    * `render_fp` = md5 of [[render]]'s flattened text, the
    * cross-engine fingerprint of the template pass. */
  def stats(df: DataFrame, conv: Column, id: Column): DataFrame =
    df.select(id.cast("long").as("doc_id"),
        from_json(conv, MessageSchema).as("__c"))
      .select(col("doc_id"),
        col("__c").isNotNull.as("parse_ok"),
        expr("CAST(size(__c) AS BIGINT)").as("n_turns"),
        expr("CAST(size(filter(__c, t -> t.role = 'user')) AS BIGINT)")
          .as("n_user"),
        expr("CAST(size(filter(__c, t -> t.role = 'assistant')) AS BIGINT)")
          .as("n_asst"),
        expr("exists(__c, t -> t.role = 'system')").as("has_system"),
        // greatest(…, 0): a WELL-FORMED empty conversation ("[]") must
        // report vacuous truth, not hit Spark's negative-length slice
        // error — the never-errors contract covers degenerate shapes too
        expr("aggregate(zip_with(slice(__c, 1, greatest(size(__c) - 1, 0))," +
          " slice(__c, 2, greatest(size(__c) - 1, 0))," +
          " (a, b) -> a.role <> b.role), true, (acc, x) -> acc AND x)")
          .as("alternation_ok"),
        expr("aggregate(__c, CAST(0 AS BIGINT)," +
          " (acc, t) -> acc + length(t.content))").as("content_chars"),
        md5(renderCol(col("__c"))).as("render_fp"))

  /** The flattening template: `<|role|>content` per message, joined by
    * newlines — the deterministic text the tokenizer sees. Null for
    * unparseable conversations. */
  def render(df: DataFrame, conv: Column, id: Column): DataFrame =
    df.select(id.cast("long").as("doc_id"),
      renderCol(from_json(conv, MessageSchema)).as("text"))

  /** Assistant-turn LOSS-MASKING spans — the [start, end) character
    * offsets of every assistant message's content inside [[render]]'s
    * flattened text. SFT training masks loss outside these spans, so
    * the offsets must be exact against the very template the tokenizer
    * consumes: `start = Σ_{j<i} (len(line_j)) + i newlines +
    * len("<|role|>")`, `end = start + len(content)`. Unparseable
    * conversations produce no rows (quarantine upstream via [[stats]]).
    *
    * A narrow projection + explode — the per-turn prefix sums run
    * inside the array world (turn counts are small), zero shuffles.
    * Output: (doc_id, turn_idx, span_start, span_end). */
  def assistantSpans(df: DataFrame, conv: Column, id: Column): DataFrame =
    df.select(id.cast("long").as("doc_id"),
        from_json(conv, MessageSchema).as("__c"))
      .where(col("__c").isNotNull)
      .withColumn("__lens", expr(
        "transform(__c, t -> length(t.role) + 4 + length(t.content))"))
      .select(col("doc_id"), explode(expr(
        // one prefix-sum per turn; the end derives from the start
        // after the explode (the quadratic lambda is the cost here)
        "filter(transform(__c, (t, i) -> named_struct(" +
          "'turn_idx', CAST(i AS BIGINT), 'role', t.role," +
          " 'span_start', aggregate(slice(__lens, 1, i)," +
          " CAST(0 AS BIGINT), (a, x) -> a + x) + i" +
          " + length(t.role) + 4," +
          " 'clen', CAST(length(t.content) AS BIGINT)))," +
          " s -> s.role = 'assistant')")).as("__s"))
      .select(col("doc_id"), col("__s.turn_idx").as("turn_idx"),
        col("__s.span_start").as("span_start"),
        (col("__s.span_start") + col("__s.clen")).as("span_end"))

  /** Preference-pair (DPO/RLHF) validation — the structural checks a
    * reward-model or DPO pipeline runs over (chosen, rejected)
    * conversation pairs before training: both sides parse, both end on
    * an assistant message (the turn being preferred), and the PROMPTS —
    * everything before each side's final message — are identical
    * (a pair whose prompts diverge isn't a preference signal, it's two
    * unrelated conversations). Prompt equality compares the parsed
    * role/content arrays element-wise, so whitespace-identical JSON
    * with reordered keys still matches.
    *
    * A pure narrow projection (two `from_json` + array ops), zero
    * shuffles. Output: (pair_id, pair_ok, ends_asst, prompt_shared,
    * n_prompt_turns) — validation fields null when either side fails
    * to parse. */
  def prefStats(df: DataFrame, chosen: Column, rejected: Column,
      id: Column): DataFrame =
    df.select(id.cast("long").as("pair_id"),
        from_json(chosen, MessageSchema).as("__c"),
        from_json(rejected, MessageSchema).as("__r"))
      .select(col("pair_id"),
        (col("__c").isNotNull && col("__r").isNotNull).as("pair_ok"),
        expr("CASE WHEN __c IS NULL OR __r IS NULL THEN NULL ELSE" +
          " size(__c) > 0 AND size(__r) > 0 AND" +
          " element_at(__c, -1).role = 'assistant' AND" +
          " element_at(__r, -1).role = 'assistant' END").as("ends_asst"),
        // greatest(…, 0) guards the same negative-length slice as
        // stats' alternation column: an empty side has an empty prompt
        expr("CASE WHEN __c IS NULL OR __r IS NULL THEN NULL ELSE" +
          " slice(__c, 1, greatest(size(__c) - 1, 0))" +
          " = slice(__r, 1, greatest(size(__r) - 1, 0)) END")
          .as("prompt_shared"),
        expr("CASE WHEN __c IS NULL OR __r IS NULL THEN NULL ELSE" +
          " CAST(greatest(size(__c) - 1, 0) AS BIGINT) END")
          .as("n_prompt_turns"))

  private def renderCol(parsed: Column): Column =
    // concat_ws turns a NULL array into '' — keep quarantined rows null
    // instead of fingerprinting the empty string
    when(parsed.isNull, lit(null).cast("string"))
      .otherwise(concat_ws("\n", transform(parsed,
        t => concat(lit("<|"), t.getField("role"), lit("|>"),
          t.getField("content")))))
}
