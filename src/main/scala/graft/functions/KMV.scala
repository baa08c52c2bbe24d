package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
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
  * The buffer is a sorted distinct array of ≤ k longs packed into
  * bytes — compact, spill-friendly, and merge-associative, so Spark's
  * partial aggregation applies on any partitioning. The DuckDB oracle
  * computes the identical value from
  * `list_sort(list_distinct(list(hash)))[k]`.
  */
object KMV {

  private val TwoPow60: Double = 1152921504606846976.0 // exact in a double

  final class Sketch(k: Int) extends Aggregator[Long, Array[Byte], Long] {
    require(k >= 2, "KMV needs k >= 2")

    private def decode(b: Array[Byte]): Array[Long] = {
      val buf = java.nio.ByteBuffer.wrap(b)
      Array.fill(b.length / 8)(buf.getLong)
    }
    private def encode(xs: Array[Long]): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(xs.length * 8)
      xs.foreach(buf.putLong)
      buf.array
    }
    // insert into sorted-distinct, keeping only the k smallest
    private def insert(xs: Array[Long], h: Long): Array[Long] = {
      val i = java.util.Arrays.binarySearch(xs, h)
      if (i >= 0) xs
      else {
        val ins = -i - 1
        if (xs.length < k) {
          val out = new Array[Long](xs.length + 1)
          System.arraycopy(xs, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(xs, ins, out, ins + 1, xs.length - ins)
          out
        } else if (ins < k) {
          val out = new Array[Long](k)
          System.arraycopy(xs, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(xs, ins, out, ins + 1, k - ins - 1)
          out
        } else xs
      }
    }

    override def zero: Array[Byte] = Array.empty[Byte]
    override def reduce(b: Array[Byte], h: Long): Array[Byte] =
      encode(insert(decode(b), h))
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      encode(decode(b).foldLeft(decode(a))(insert))
    override def finish(b: Array[Byte]): Long = {
      val xs = decode(b)
      if (xs.length < k) xs.length.toLong
      else math.round((k - 1).toDouble * TwoPow60 / xs.last)
    }
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Column aggregate: `df.groupBy(...).agg(KMV.distinctEst(hash60Col, 64))`.
    * The input must already be a uniform non-negative hash (use
    * [[graft.ext.Text.hash60]] for oracle portability). */
  def distinctEst(hash: Column, k: Int): Column =
    udaf(new Sketch(k)).apply(hash)
}
