package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** m0003 analog — the reference's third migration exists purely to make
  * "summaries for an account filtered by height or timestamp" fast by
  * adding covering indexes (`m0003-…sql:1-12`; CHANGELOG.md:5-8). The
  * Spark-native equivalent of a covering index is PHYSICAL LAYOUT: a
  * parquet mirror of `summaries`
  *
  *  - hive-partitioned by a height bucket (`height_bucket = height /
  *    BucketSize`), so a height-range predicate prunes whole directories
  *    before any IO (PartitionFilters in the scan);
  *  - sorted by (height, timestamp) within files, so the parquet
  *    row-group min/max statistics make timestamp-range predicates skip
  *    pages (PushedFilters reach the scan). Block time is monotone in
  *    height, so one sort serves both range columns.
  *
  * At 100 TB this is the difference between scanning the fact table and
  * touching only the buckets a B12 range query names. The serving-DB
  * indexes stay on the Postgres side; this mirror feeds the analytic
  * path.
  */
object SummaryMirror {

  /** Heights per partition directory. ~10k blocks/day at 2s finality ⇒
    * one directory ≈ several hours of chain; tune per deployment (too
    * small ⇒ many tiny files, too big ⇒ weak pruning). */
  val BucketSize: Long = 1000L

  def bucketOf(height: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(height / BucketSize).cast("long")

  /** Write/refresh the mirror. Idempotent per bucket (dynamic partition
    * overwrite keeps untouched buckets). */
  def write(summaries: DataFrame, path: String): Unit =
    summaries
      .withColumn("height_bucket", bucketOf(col("height")))
      .repartition(col("height_bucket"))
      .sortWithinPartitions("height", "id")
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("height_bucket")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** B12 over the mirror: the height range is translated to a bucket
    * range so Catalyst prunes partitions; the residual height/timestamp
    * predicates push into the parquet scan for row-group skipping. */
  def heightRange(mirror: DataFrame, lo: Long, hi: Long): DataFrame =
    mirror.where(
      col("height_bucket").between(lo / BucketSize, hi / BucketSize) &&
        col("height").between(lo, hi))

  def timestampRange(mirror: DataFrame, loMs: Long, hiMs: Long): DataFrame =
    mirror.where(col("timestamp").between(loMs, hiMs))
}
