package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types._
import org.apache.spark.sql.Encoder

/** Bloom-filter sketch for runtime join pruning — the distributed
  * semi-join pattern that matters at 100 TB: build a compact membership
  * filter over the dim side's join keys (one partial-aggregated pass,
  * merge = bitwise OR), broadcast the few MB of filter to every fact
  * partition, and drop non-matching fact rows BEFORE the shuffle of the
  * exact join. Spark's AQE injects this automatically in some shapes
  * (`spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`); this is
  * the explicit, composable form with a codegen probe, usable on any
  * plan shape (see [[graft.operators.BloomSemiJoin]]).
  *
  * The serialized filter is self-describing: byte 0 = number of hash
  * functions, bytes 1.. = the bit array (LSB-first per byte), so the
  * probe expression needs no sizing parameters. Bit positions come from
  * double hashing of the caller-supplied 64-bit key hash (xxhash64 on
  * the column): index_i = (h1 + i·h2) mod m with h2 forced odd. No
  * false negatives by construction; false-positive rate follows the
  * standard (1-e^{-jn/m})^j bound.
  */
object Bloom {

  /** Optimal bit count m = -n·ln(p)/ln(2)^2, rounded up to a word and
    * capped (default cap 2^26 bits = 8 MiB, the same order as Spark's
    * own runtime-filter bound) — an oversubscribed filter degrades to a
    * higher false-positive rate, never to wrong results. */
  def optimalBits(expectedItems: Long, fpp: Double,
                  maxBits: Long = 1L << 26): Int = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1, "need n > 0, 0 < fpp < 1")
    val ln2sq = math.log(2) * math.log(2)
    val ideal = math.ceil(-expectedItems * math.log(fpp) / ln2sq).toLong
    val words = math.max(1L, math.min(ideal, maxBits) + 63L >> 6)
    (words << 6).toInt
  }

  /** Optimal hash count j = m/n·ln(2), clamped to [1, 64]. */
  def optimalHashes(numBits: Long, expectedItems: Long): Int =
    math.max(1, math.min(64,
      math.round(numBits.toDouble / expectedItems * math.log(2)))).toInt

  private def h2(h: Long): Long =
    (java.lang.Long.rotateLeft(h, 32) * 0x9E3779B97F4A7C15L) | 1L

  /** Membership probe against the serialized filter (static: called
    * from generated code). */
  def mightContain(bloom: Array[Byte], h: Long): Boolean = {
    val j = bloom(0) & 0xff
    val m = (bloom.length - 1).toLong << 3
    val step = h2(h)
    var i = 0
    var g = h
    while (i < j) {
      val bit = java.lang.Long.remainderUnsigned(g, m)
      if ((bloom(1 + (bit >>> 3).toInt) & (1 << (bit & 7).toInt)) == 0)
        return false
      g += step
      i += 1
    }
    true
  }

  /** Aggregator building the filter from 64-bit key hashes. Buffer =
    * long[1 + words]: slot 0 holds the hash count (self-description
    * survives the shuffle encoder), slots 1.. the bit words. reduce
    * mutates in place — zero allocation per row; merge ORs word-wise. */
  final class Agg(numBits: Int, numHashes: Int)
      extends Aggregator[Long, Array[Long], Array[Byte]] {
    require(numBits % 64 == 0 && numBits > 0, "numBits must be a positive multiple of 64")
    require(numHashes >= 1 && numHashes <= 64, "numHashes in [1, 64]")

    override def zero: Array[Long] = {
      val b = new Array[Long](1 + numBits / 64)
      b(0) = numHashes
      b
    }

    override def reduce(b: Array[Long], h: Long): Array[Long] = {
      val m = (b.length - 1).toLong << 6
      val step = h2(h)
      var i = 0
      var g = h
      while (i < numHashes) {
        val bit = java.lang.Long.remainderUnsigned(g, m)
        b(1 + (bit >>> 6).toInt) |= 1L << (bit & 63)
        g += step
        i += 1
      }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 1
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(b: Array[Long]): Array[Byte] = {
      val out = new Array[Byte](1 + (b.length - 1) * 8)
      out(0) = b(0).toByte
      var w = 1
      while (w < b.length) {
        val v = b(w)
        val base = 1 + (w - 1) * 8
        var k = 0
        while (k < 8) { out(base + k) = (v >>> (8 * k)).toByte; k += 1 }
        w += 1
      }
      out
    }

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Byte]] = ExpressionEncoder()
  }
}

/** `bloom_might_contain(filter, hash)` — codegen membership probe; sits
  * in the fact table's per-row hot path, so it must stay inside
  * whole-stage codegen (same pattern as [[MinHash64]]). */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires (binary, bigint), got $other")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(bloom: Any, h: Any): Any =
    Bloom.mightContain(bloom.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, h) =>
      s"graft.functions.Bloom.mightContain($b, $h)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
