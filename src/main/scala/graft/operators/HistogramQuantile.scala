package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic approximate quantiles at scale: a fixed-width integer
  * histogram plus a per-key cumulative walk. `percentile_approx`'s GK
  * sketch is engine-specific (never oracle-matchable) and an exact
  * per-key sort is a full shuffle of the data; the histogram needs ONE
  * uniform (key, bin) partial-agg shuffle over the data and then
  * windows over at most `#bins` rows per key. Error is bounded by
  * `binWidth` (the reported quantile is the UPPER edge of the first
  * bin whose cumulative count reaches pct% of the key's total), and
  * the result is a pure function of the data — identical under any
  * partitioning, portable to the DuckDB oracle.
  *
  * `valueInt` must be a NON-NEGATIVE integral column (quantize floats
  * first, e.g. `round(value * 100)` cents — the corpus convention);
  * the bin is floor(value / binWidth).
  */
object HistogramQuantile {

  def quantiles(df: DataFrame, key: Column, valueInt: Column,
                binWidth: Long, pcts: Seq[Int]): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(pcts.nonEmpty && pcts.forall(p => p > 0 && p <= 100),
      "pcts must be percentages in (0, 100]")
    val counts = df
      .select(key.as("k"),
        floor(valueInt.cast("long") / binWidth).cast("long").as("bin"))
      .groupBy("k", "bin").agg(count(lit(1)).as("n"))
    val cum = counts
      .withColumn("cum", sum("n").over(Window.partitionBy("k").orderBy("bin")))
      .withColumn("total", sum("n").over(Window.partitionBy("k")))
    val qs = pcts.map(p =>
      min(when(col("cum") * 100 >= col("total") * p, col("bin")))
        .as(s"__p$p"))
    cum.groupBy("k").agg(qs.head, qs.tail: _*)
      .select(col("k") +: pcts.map(p =>
        ((col(s"__p$p") + 1L) * binWidth).as(s"p${p}_hi")): _*)
  }
}
