package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_shingles(words, k)` — k-word shingles (space-joined windows) of
  * a word array in one native pass.
  *
  * Semantically identical to the portable HOF formulation mirrored by
  * the DuckDB oracle (`list_transform(range(len(w)-k+1), i ->
  * array_to_string(w[i+1:i+k], ' '))`), but the HOF version runs
  * INTERPRETED — per window it allocated a sliced array and evaluated a
  * concat_ws expression tree, which made shingle construction the
  * dominant cost of every shingle consumer (fingerprint, n-gram
  * Jaccard, the MinHash pipeline feeds). Here each shingle is one
  * `UTF8String.concatWs` over a reused slice buffer inside whole-stage
  * codegen. */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires a positive k, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.compute(input.asInstanceOf[ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** `min_md5(strings)` — lexicographic minimum of `md5(s)` hex digests
  * over a string array, in one pass without materializing any hex
  * string until the final result.
  *
  * Replaces `array_min(transform(arr, s -> md5(s)))` (interpreted HOF,
  * one 32-char hex allocation + string comparison per element). Digests
  * are compared as unsigned bytes, which orders exactly like the
  * lowercase-hex strings both engines print (hex is monotone in the
  * byte value), so the result is identical to the oracle's
  * `list_min(list_transform(arr, s -> md5(s)))`. Empty input yields
  * null (as array_min of an empty array did). */
case class MinMd5(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"min_md5 requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "min_md5"

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.minMd5(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ShingleUtil.minMd5($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): MinMd5 =
    copy(child = newChild)
}

/** Static helpers referenced from generated code. */
object ShingleUtil {

  private val Space = UTF8String.fromString(" ")

  def compute(words: ArrayData, k: Int): ArrayData = {
    val n = words.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    val window = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) {
        window(j) =
          if (words.isNullAt(i + j)) null else words.getUTF8String(i + j)
        j += 1
      }
      // concatWs skips nulls — same as the concat_ws the HOF version used
      out(i) = UTF8String.concatWs(Space, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  private val Hex = "0123456789abcdef".toCharArray

  /** Min md5 digest over the array, printed as lowercase hex; null for
    * an empty array (null elements are skipped like array_min does). */
  def minMd5(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    val md = SimHashUtil.digest()
    var min: Array[Byte] = null
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        if (min == null || unsignedLess(d, min)) min = d
      }
      i += 1
    }
    if (min == null) null
    else {
      val hex = new Array[Byte](32)
      var j = 0
      while (j < 16) {
        val v = min(j) & 0xff
        hex(2 * j) = Hex(v >>> 4).toByte
        hex(2 * j + 1) = Hex(v & 0xf).toByte
        j += 1
      }
      UTF8String.fromBytes(hex)
    }
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }
}
