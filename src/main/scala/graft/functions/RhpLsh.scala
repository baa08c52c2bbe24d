package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `rhplsh(qe, bands, planes)` — multi-band random-hyperplane LSH over a
  * quantized embedding (array<long>): one `planes`-bit bucket id per
  * band, bit p of band b set iff `sum_i qe[i] * w(b,p,i) > 0` with
  * md5-derived integer plane weights
  * `w(b,p,i) = hash60(md5(b || ':' || p || ':' || i)) % 1000 - 500`.
  *
  * Two near-dup vectors collide when they share a bucket in ANY band;
  * for vectors at angle θ a single plane agrees with probability
  * q = 1 - θ/π, so recall = 1 - (1 - q^planes)^bands — `planes` buys
  * precision (expected bucket size n / 2^planes), `bands` buys the
  * recall back. The defaults (8 bands × 16 planes) keep recall > 0.99
  * for cosine ≥ 0.99 pairs while shrinking the in-bucket self-join from
  * O(n²/2^4) (the old single-band 4-plane scheme) to O(bands · n²/2^16).
  *
  * The weight matrix is a pure function of (bands, planes, dim) and is
  * cached statically — computed once per executor JVM, NOT per row (the
  * previous formulation re-derived every weight from md5 per row inside
  * an interpreted higher-order function). The expression itself is
  * codegen-friendly via a static call, and the DuckDB oracle reproduces
  * the identical buckets from a `range(bands) × range(planes) ×
  * range(dim)` weights CTE.
  *
  * Input elements must be non-null (quantized embeddings are).
  */
case class RhpLsh(child: Expression, bands: Int, planes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if bands > 0 && planes > 0 && planes < 64 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckFailure(
      s"rhplsh requires 0 < planes < 64 and bands > 0, got bands=$bands planes=$planes")
    case other => TypeCheckResult.TypeCheckFailure(
      s"rhplsh requires array<bigint> (a quantized embedding), got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rhplsh"

  override def nullSafeEval(input: Any): Any =
    RhpLshUtil.compute(input.asInstanceOf[ArrayData], bands, planes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RhpLshUtil.compute($c, $bands, $planes)")

  override protected def withNewChildInternal(newChild: Expression): RhpLsh =
    copy(child = newChild)
}

/** Static helper referenced from generated code. */
object RhpLshUtil {

  // (bands, planes, dim) → [band*planes + p][i] integer plane weights.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Long]]]()

  def weights(bands: Int, planes: Int, dim: Int): Array[Array[Long]] =
    cache.computeIfAbsent((bands, planes, dim), _ =>
      Array.tabulate(bands * planes) { bp =>
        val b = bp / planes
        val p = bp % planes
        Array.tabulate(dim) { i =>
          SimHashUtil.hash60(s"$b:$p:$i".getBytes("UTF-8")) % 1000 - 500
        }
      })

  def compute(qe: ArrayData, bands: Int, planes: Int): ArrayData = {
    val dim = qe.numElements()
    val w = weights(bands, planes, dim)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        val wv = w(b * planes + p)
        var s = 0L
        var i = 0
        while (i < dim) { s += qe.getLong(i) * wv(i); i += 1 }
        if (s > 0) bucket |= 1L << p
        p += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }
}
