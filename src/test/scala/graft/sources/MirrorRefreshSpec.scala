package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec

/** Incremental mirror refresh ([[BucketedMirror.append]]): a serving
  * mirror fed batch-by-batch (the `foreachBatch` shape of a
  * continuously-ingesting upstream) must equal the one-shot mirror AND
  * keep the bucket properties that make it a serving mirror — shuffle
  * elision on the bucket key and bucket pruning on key literals —
  * across the appended file generations.
  */
class MirrorRefreshSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private val dir = Files.createTempDirectory("mirror_refresh").toFile
  private def rows(lo: Long, hi: Long) =
    (lo until hi).map(i => (i % 16, i, s"row-$i")).toDF("k", "id", "payload")

  override def beforeAll(): Unit = {
    super.beforeAll()
    BucketedMirror.write(rows(0, 600), "refresh_m",
      new java.io.File(dir, "m").getAbsolutePath, "k", buckets = 8,
      sortCols = Seq("k", "id"))
    // two incremental generations, as two ingest micro-batches would add
    BucketedMirror.append(rows(600, 800), "refresh_m", "k", buckets = 8,
      sortCols = Seq("k", "id"))
    BucketedMirror.append(rows(800, 1000), "refresh_m", "k", buckets = 8,
      sortCols = Seq("k", "id"))
  }

  override def afterAll(): Unit = {
    spark.sql("DROP TABLE IF EXISTS refresh_m")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    super.afterAll()
  }

  test("appended mirror equals the one-shot content") {
    val got = BucketedMirror.table(spark, "refresh_m")
      .as[(Long, Long, String)].collect().toSet
    assert(got == rows(0, 1000).as[(Long, Long, String)].collect().toSet)
  }

  test("shuffle elision survives appended file generations") {
    val agg = BucketedMirror.table(spark, "refresh_m")
      .groupBy("k").agg(count(lit(1)).as("n"))
    val p = agg.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"bucketed groupBy must stay shuffle-free after appends:\n$p")
    // exact per-key counts: 1000 rows over k = i % 16 → keys 0-7 get
    // 63, keys 8-15 get 62 — a dropped or duplicated append generation
    // fails here, not just a vanished key
    val got = agg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (0L until 16L).map(k => k -> (if (k < 8) 63L else 62L)).toMap
    assert(got == expected, s"per-key counts after appends: $got")
  }

  test("bucket pruning survives appended file generations") {
    val k = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val saved = spark.conf.get(k)
    spark.conf.set(k, "false")
    try {
      val p = BucketedMirror.table(spark, "refresh_m")
        .where(col("k") === 3L)
        .queryExecution.executedPlan.toString
      assert(p.contains("SelectedBucketsCount: 1 out of 8"),
        s"key literal must still prune to one bucket:\n$p")
    } finally spark.conf.set(k, saved)
  }

  test("a mismatched bucket spec is rejected, not silently mixed") {
    intercept[Exception] {
      BucketedMirror.append(rows(0, 10), "refresh_m", "k", buckets = 4)
    }
  }
}
