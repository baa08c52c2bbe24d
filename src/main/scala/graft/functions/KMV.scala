package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct-count sketch.
  *
  * Where HyperLogLog would be the usual choice, its register layout is
  * engine-specific — Spark's approx_count_distinct and DuckDB's can
  * never hash-match. KMV gives the same O(k) bounded state and
  * mergeability with a fully DETERMINISTIC, engine-portable estimate:
  * keep the k smallest distinct 60-bit hashes of the items; if fewer
  * than k exist the count is exact, otherwise the k-th smallest hash
  * estimates density on [0, 2^60) and
  * `(k-1) * 2^60 / kth_smallest` estimates the distinct count
  * (standard error ≈ 1/sqrt(k-2)).
  *
  * The buffer is a sorted distinct array of ≤ k longs (fixed capacity
  * k, Long.MaxValue sentinel in unused slots) — compact, spill-friendly,
  * and merge-associative, so Spark's partial aggregation applies on any
  * partitioning. The DuckDB oracle computes the identical value from
  * `list_sort(list_distinct(list(hash)))[k]`.
  */
object KMV {

  private val TwoPow60: Double = 1152921504606846976.0 // exact in a double

  final class Sketch(k: Int) extends Aggregator[Long, Array[Long], Long] {
    require(k >= 2, "KMV needs k >= 2")

    // The buffer is a fixed-size sorted long[] of capacity k; unused
    // slots hold Long.MaxValue (valid hash60 inputs are < 2^60, so the
    // sentinel can never collide with a real hash). Spark holds the
    // buffer as a live object between reduce calls and only runs the
    // encoder at partial-aggregation shuffle boundaries, so in-place
    // mutation makes the per-row cost a binary search + arraycopy with
    // ZERO allocation (the old formulation re-encoded a byte buffer per
    // input row — O(k) alloc each).
    private def insertInPlace(xs: Array[Long], h: Long): Array[Long] = {
      val i = java.util.Arrays.binarySearch(xs, h)
      if (i < 0) {
        val ins = -i - 1
        if (ins < k) {
          System.arraycopy(xs, ins, xs, ins + 1, k - ins - 1)
          xs(ins) = h
        }
      }
      xs
    }

    override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)
    override def reduce(b: Array[Long], h: Long): Array[Long] =
      insertInPlace(b, h)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < k && b(i) != Long.MaxValue) { insertInPlace(a, b(i)); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Long = {
      var n = 0
      while (n < k && b(n) != Long.MaxValue) n += 1
      if (n < k) n.toLong
      else math.round((k - 1).toDouble * TwoPow60 / b(k - 1))
    }
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Column aggregate: `df.groupBy(...).agg(KMV.distinctEst(hash60Col, 64))`.
    * The input must already be a uniform non-negative hash (use
    * [[graft.ext.Text.hash60]] for oracle portability). */
  def distinctEst(hash: Column, k: Int): Column =
    udaf(new Sketch(k)).apply(hash)
}
