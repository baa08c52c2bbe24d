package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text/hash primitives for the ext operators.
  *
  * Design constraint: every primitive must be *portable* — expressible
  * identically in Spark and in the DuckDB oracle SQL — and
  * *deterministic under any partitioning*. Hence:
  *  - hashing is md5-based (both engines agree byte-for-byte on md5 of
  *    UTF-8), either kept as hex strings (order by/min works
  *    lexicographically) or folded to a 60-bit long via the first 15
  *    hex chars;
  *  - no engine-native hash() (Spark murmur3 ≠ DuckDB's);
  *  - float-sensitive math is quantized to integers first (see
  *    [[Similarity]]).
  */
object Text {

  /** First 60 bits of md5 as a non-negative long.
    * DuckDB equivalent: `CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)`.
    *
    * Computed by the native [[graft.functions.Hash60Md5]] expression —
    * bit-identical to the previous portable
    * `conv(substring(md5(c),1,15),16,10).cast("long")` chain (pinned by
    * Hash60Spec against that exact formulation), without its four
    * per-row string allocations (md5 hex, substring, conv's decimal
    * string, the cast's parse). hash60 runs on every exploded
    * shingle/line/window/url row of the dedup and curation families,
    * so the chain was the hottest scalar in the engine. Built directly
    * as an expression Column (no registry round trip), so every caller
    * — registered session or not — gets the native path. */
  def hash60(c: Column): Column =
    org.apache.spark.sql.GraftColumn.of(
      graft.functions.Hash60Md5(org.apache.spark.sql.GraftColumn.expr(c)))

  /** Whitespace word split (trimmed, multi-space tolerant).
    * DuckDB: `string_split_regex(trim(text), ' +')`. */
  def words(text: Column): Column = split(trim(text), " +")

  /** k-word shingles as space-joined strings; empty array if fewer than
    * k words. DuckDB: `list_transform(range(len(w)-k+1), i ->
    * array_to_string(w[i+1:i+k], ' '))`.
    *
    * Computed by the native [[graft.functions.WordShingles]] expression
    * (one codegen'd pass; the previous `transform`+`slice`+`concat_ws`
    * HOF ran interpreted and dominated every shingle consumer). The
    * `when` wrapper keeps the old null-text behavior (empty array, not
    * null). Callers must have [[graft.functions.GraftFunctions]]
    * registered — every graft.ext entry point does that. */
  def shingles(text: Column, k: Int): Column = {
    val w = words(text)
    when(size(w) >= k, call_function("word_shingles", w, lit(k)))
      .otherwise(array().cast("array<string>"))
  }

  /** Tokens: word runs or single punctuation chars (a BPE-ish regex
    * both engines interpret identically on ASCII).
    * DuckDB: `regexp_extract_all(text, '[0-9A-Za-z_]+|[^0-9A-Za-z_ ]')`.
    *
    * Computed by the native [[graft.functions.WordTokens]] byte scanner
    * (the regex machine was the residual hot-path cost after the other
    * text natives); callers must have GraftFunctions registered — every
    * graft.ext entry point does. */
  val TokenRe = "[0-9A-Za-z_]+|[^0-9A-Za-z_ ]"
  def tokens(text: Column): Column = call_function("word_tokens", text)
}
