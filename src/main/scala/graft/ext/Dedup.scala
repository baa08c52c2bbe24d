package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large corpora. Every variant is a pure
  * DataFrame plan — no driver-side state, no collect — and keyed so the
  * shuffles are on bounded keys (hashes / band buckets), which is what
  * survives 100 TB: candidate generation is always blocking-based
  * (hash buckets), never an all-pairs cross join.
  */
object Dedup {

  /** Exact dedup by content hash: one shuffle on the 128-bit hash
    * (uniform — no skew), map-side partial aggregation. Keeper = min id
    * (deterministic). */
  def exact(df: DataFrame, content: Column, id: Column): DataFrame =
    df.groupBy(md5(content).as("content_hash"))
      .agg(min(id).as("keeper_doc_id"), count(lit(1)).as("n_copies"))
}
