package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Arbitrary-precision integer sum over signed decimal strings.
  *
  * The reference stores CIS-2 token supply as `NUMERIC(80,0)` and amounts
  * arrive as decimal strings (`CAST($4 AS TEXT)::NUMERIC`, main.rs:231,246;
  * `amount.0.to_string()`, main.rs:428,450). CIS-2 amounts may be up to
  * 2^256, which exceeds Spark's `DecimalType(38,0)`, so the sum is done in
  * `java.math.BigInteger` with a two's-complement byte-array buffer
  * (compact, spill-friendly, merge-associative — safe under partial
  * aggregation on any partitioning).
  *
  * Input: nullable signed decimal string ("-123", "4567", null ignored).
  * Output: signed decimal string.
  */
object U256 {

  private val sum = new Aggregator[String, Array[Byte], String] {
    override def zero: Array[Byte] = Array[Byte](0)
    override def reduce(b: Array[Byte], a: String): Array[Byte] =
      if (a == null || a.isEmpty) b
      else new BigInteger(b).add(new BigInteger(a.trim)).toByteArray
    override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
      new BigInteger(b1).add(new BigInteger(b2)).toByteArray
    override def finish(r: Array[Byte]): String = new BigInteger(r).toString
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Column-level aggregate: `df.agg(U256.sumBig($"amount"))`. */
  def sumBig(amount: Column): Column = udaf(sum).apply(amount)
}
