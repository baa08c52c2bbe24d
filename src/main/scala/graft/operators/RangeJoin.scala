package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join, banded for scale. The reference has no
  * range joins (SURVEY §2.C); this is part of the engine's general
  * relational surface. A naive formulation — join on the equi-key and
  * filter `start <= pt < end`, or worse, a pure inequality theta join —
  * either funnels every row of a hot key through one reducer or plans a
  * cartesian product.
  *
  * The banded plan: intervals explode to the fixed-width buckets they
  * cover (`floor(start/w) .. floor((end-1)/w)`), points compute their
  * single bucket, and the join runs on (key, bucket) — uniform shuffle
  * keys, work proportional to interval-width/bucket-width per row, no
  * cross join. A point's bucket matches exactly one exploded bucket row
  * per interval, so no dedup is needed; the exact containment predicate
  * runs as a post-join filter. Pick `bucketWidth` near the typical
  * interval length: shorter ⇒ more interval replicas, longer ⇒ more
  * false candidates filtered after the join.
  */
object RangeJoin {

  /** @param points     table with the point column
    * @param intervals  table with [startCol, endCol) half-open intervals
    * @param keys       equi-key pairs (pointCol -> intervalCol), may be empty
    * @param pt         point expression (numeric, e.g. epoch ms)
    * @param start      interval start (inclusive)
    * @param end        interval end (exclusive)
    * @param bucketWidth band width in the same unit as `pt` */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[(String, String)],
                      pt: Column, start: Column, end: Column,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bucket", floor(pt / bucketWidth))
    val iv = intervals
      .where(end > start)
      .withColumn("__bucket",
        explode(sequence(floor(start / bucketWidth), floor((end - 1) / bucketWidth))))
    val cond = (p("__bucket") === iv("__bucket")) +:
      keys.map { case (pk, ik) => p(pk) === iv(ik) }
    p.join(iv, cond.reduce(_ && _))
      .where(start <= pt && pt < end)
      .drop("__bucket")
  }
}
