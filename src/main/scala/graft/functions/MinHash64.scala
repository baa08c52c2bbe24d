package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `minhash64(tokens, n)` — n-element MinHash signature of a token/shingle
  * array in one pass (native codegen Expression).
  *
  * Element p of the signature is `min over tokens s of hash60(md5(p ||
  * ':' || s))` where hash60 = first 60 bits of the md5 as a non-negative
  * long — the md5-as-random-permutation trick shared with
  * [[SimHash60]], chosen because DuckDB computes the identical value
  * (`min(CAST(('0x' || substr(md5(p || ':' || s),1,15)) AS BIGINT))`),
  * so the oracle stays exact.
  *
  * This replaces the round-1 interpreted formulation (nested
  * `transform`/`array_min` higher-order functions over md5 hex STRINGS —
  * HOF lambdas never enter whole-stage codegen and allocated a hex
  * string per (token × hash)), which burned 127.8s of a 174.8s bench.
  * Here the whole signature is one tight JVM loop over reused digest
  * buffers: a narrow map, no explode, no shuffle, codegen-friendly —
  * the shape that survives 100 TB.
  */
case class MinHash64(child: Expression, numHashes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"minhash64 requires a positive hash count, got $numHashes")
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash64 requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash64"

  override def nullSafeEval(input: Any): Any =
    MinHashUtil.compute(input.asInstanceOf[ArrayData], numHashes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashUtil.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHash64 =
    copy(child = newChild)
}

/** Static helper referenced from generated code. */
object MinHashUtil {
  /** Signature element p = min over tokens of hash60(md5(p + ":" + tok)).
    * Tokens sets that are empty (callers filter those out) or all-null
    * yield Long.MaxValue sentinels. */
  def compute(tokens: ArrayData, numHashes: Int): ArrayData = {
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = SimHashUtil.digest()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val tok = tokens.getUTF8String(i).getBytes
        var p = 0
        while (p < numHashes) {
          md.reset()
          md.update(MinHashUtil.prefix(p))
          md.update(tok)
          val d = md.digest()
          var h = 0L
          var k = 0
          while (k < 7) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
          h = (h << 4) | ((d(7) & 0xf0L) >>> 4)
          if (h < mins(p)) mins(p) = h
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  // "p:" prefixes, cached so the per-token loop allocates nothing.
  private val cached = new java.util.concurrent.ConcurrentHashMap[Int, Array[Byte]]()
  def prefix(p: Int): Array[Byte] =
    cached.computeIfAbsent(p, i => s"$i:".getBytes("UTF-8"))
}
