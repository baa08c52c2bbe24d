package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HistogramQuantileSpec extends SparkSpec {
  import spark.implicits._

  test("quantile = upper edge of first bin reaching the cumulative share") {
    // values 1..100, binWidth 10: bins 0(1-9)=9 rows, 1..9 = 10 rows
    // each, bin 10 (=100) = 1 row. Cumulatives: 9,19,…,99,100 → p50
    // lands in bin 5 (cum 59), p90 and p99 in bin 9 (cum 99).
    val df = (1L to 100L).toDF("v")
    val out = HistogramQuantile.quantiles(df, lit("all"), col("v"),
      binWidth = 10, pcts = Seq(50, 90, 99)).head()
    assert(out.getLong(1) == 60L, s"p50_hi: $out")
    assert(out.getLong(2) == 100L && out.getLong(3) == 100L)
  }

  test("per-key quantiles are independent and partitioning-invariant") {
    val df = ((1L to 100L).map(("a", _)) ++ (1L to 10L).map(("b", _)))
      .toDF("k", "v")
    def run(parts: Int) = HistogramQuantile
      .quantiles(df.repartition(parts), col("k"), col("v"), 10, Seq(50))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val expected = Seq(("a", 60L), ("b", 10L)) // b: cum in bin 0 is 9 of 10
    assert(run(1) == expected && run(7) == expected)
  }

  test("estimate brackets the exact quantile within one bin width") {
    val vals = (1L to 997L).map(i => (i * 7919) % 1000) // pseudo-shuffled
    val df = vals.toDF("v")
    val exact = vals.sorted.apply((vals.size * 50 + 99) / 100 - 1)
    val est = HistogramQuantile.quantiles(df, lit("all"), col("v"),
      binWidth = 16, pcts = Seq(50)).head().getLong(1)
    assert(est >= exact && est <= exact + 16,
      s"p50 estimate $est outside ($exact, ${exact + 16}]")
  }
}
