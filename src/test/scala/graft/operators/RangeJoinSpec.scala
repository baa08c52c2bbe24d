package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(
    (1L, 100L), (1L, 105L), (1L, 110L), // around interval A
    (2L, 100L),                         // right key, other customer
    (1L, 250L), (1L, 299L), (1L, 300L)  // B boundary cases
  ).toDF("key", "pt")

  private def intervals = Seq(
    (10L, 1L, 100L, 110L), // A: [100, 110) — spans 2 width-8 buckets
    (20L, 1L, 250L, 300L), // B: [250, 300) — spans 7 buckets
    (30L, 1L, 500L, 500L), // empty — dropped
    (40L, 2L, 90L, 120L)   // C: other key
  ).toDF("iv_id", "ikey", "s", "e")

  test("banded join equals the naive key+filter join; boundaries half-open") {
    val banded = RangeJoin.pointInInterval(points, intervals,
        Seq("key" -> "ikey"), col("pt"), col("s"), col("e"), bucketWidth = 8)
      .select("iv_id", "key", "pt").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val p = points
    val iv = intervals
    val naive = p.join(iv,
        p("key") === iv("ikey") &&
          col("s") <= col("pt") && col("pt") < col("e"))
      .select("iv_id", "key", "pt").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(banded == naive)
    // A gets pts 100 (start inclusive) and 105, NOT 110 (end exclusive);
    // B gets 250 and 299, NOT 300; C gets the key-2 point at 100.
    assert(banded == Seq((10L, 1L, 100L), (10L, 1L, 105L),
      (20L, 1L, 250L), (20L, 1L, 299L), (40L, 2L, 100L)))
  }

  test("a point matches an interval exactly once even across bucket seams") {
    // interval spanning many buckets; each contained point appears once
    val p = (0L until 50L).map(i => (1L, i * 10L)).toDF("key", "pt")
    val iv = Seq((1L, 1L, 0L, 500L)).toDF("iv_id", "ikey", "s", "e")
    val out = RangeJoin.pointInInterval(p, iv, Seq("key" -> "ikey"),
      col("pt"), col("s"), col("e"), bucketWidth = 7)
    assert(out.count() == 50L)
    assert(out.select("pt").distinct().count() == 50L)
  }
}
