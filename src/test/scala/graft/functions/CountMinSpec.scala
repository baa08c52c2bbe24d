package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[CountMin]] sketch invariants: exactness without collisions, the
  * one-sided error guarantee under forced collisions, and
  * merge-associativity (the property that makes map-side partial
  * aggregation safe on any partitioning).
  */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  test("estimates are exact when the width avoids collisions") {
    val rows = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val sk = rows.toDF("k")
      .agg(CountMin.sketch(col("k"), depth = 4, width = 256).as("sk"))
    val out = sk.select(
      CountMin.estimate(col("sk"), "a", 4, 256).as("a"),
      CountMin.estimate(col("sk"), "b", 4, 256).as("b"),
      CountMin.estimate(col("sk"), "c", 4, 256).as("c"),
      CountMin.estimate(col("sk"), "absent", 4, 256).as("none")).head()
    assert(out.getLong(0) == 5L && out.getLong(1) == 3L &&
      out.getLong(2) == 1L && out.getLong(3) == 0L)
  }

  test("estimates never undercount, even with forced collisions") {
    // 26 keys into width 8 → many collisions per row; min-over-rows may
    // overcount but must NEVER undercount
    val rows = (0 until 260).map(i => s"k${i % 26}")
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sk = rows.toDF("k")
      .agg(CountMin.sketch(col("k"), depth = 4, width = 8).as("sk"))
    val ests = sk.select(truth.keys.toSeq.sorted.map(k =>
      CountMin.estimate(col("sk"), k, 4, 8).as(k)): _*).head()
    truth.keys.toSeq.sorted.zipWithIndex.foreach { case (k, i) =>
      assert(ests.getLong(i) >= truth(k),
        s"estimate for $k undercounts: ${ests.getLong(i)} < ${truth(k)}")
    }
  }

  test("null keys count nowhere, matching the oracle's null-concat drop") {
    val withNulls = Seq(Some("a"), None, Some("a"), None).toDF("k")
    val sk = withNulls
      .agg(CountMin.sketch(col("k"), depth = 4, width = 256).as("sk"))
    val out = sk.select(
      CountMin.estimate(col("sk"), "a", 4, 256).as("a"),
      CountMin.estimate(col("sk"), "null", 4, 256).as("lit_null")).head()
    assert(out.getLong(0) == 2L)
    // the literal string "null" must NOT have absorbed the null rows
    assert(out.getLong(1) == 0L)
  }

  test("the sketch is partitioning-invariant (merge associativity)") {
    val rows = (0 until 500).map(i => s"u${i % 37}").toDF("k")
    def sketchOf(parts: Int): Seq[Long] =
      rows.repartition(parts)
        .agg(CountMin.sketch(col("k"), depth = 4, width = 64).as("sk"))
        .head().getSeq[Long](0)
    assert(sketchOf(1) == sketchOf(7))
  }
}
