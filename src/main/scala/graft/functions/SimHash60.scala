package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `simhash60(tokens)` — 60-bit SimHash fingerprint of a token array in a
  * single pass (native codegen Expression; stays inside whole-stage
  * codegen via a static call).
  *
  * Semantics are bit-identical to the portable SQL formulation mirrored
  * by the DuckDB oracle (graft.ext.Dedup): for every token,
  * `h = first 60 bits of md5(token)`; `vote_j += ((h>>j)&1)*2-1`; output
  * bit j is set iff `vote_j > 0`. The reference has no text operators —
  * this is part of the LLM-pipeline extension surface; the single-pass
  * form replaces a 60x row explosion + two shuffles with a narrow map,
  * which is the difference between hours and minutes at 100 TB.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash60 requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def nullSafeEval(input: Any): Any =
    SimHashUtil.compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashUtil.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

/** Static helpers referenced from generated code (Scala object methods
  * compile to static forwarders, callable from Janino-compiled Java). */
object SimHashUtil {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Thread-local MD5 instance, shared with [[MinHashUtil]] so the hot
    * loops allocate no digest objects. Callers must `reset()` before use. */
  def digest(): MessageDigest = digests.get()

  // reused 16-byte digest sink: digest(buf, 0, 16) writes in place, so
  // the hot hash60 loop allocates nothing per call
  private val outBufs = ThreadLocal.withInitial[Array[Byte]](() =>
    new Array[Byte](16))

  /** First 60 bits of md5(bytes) as a non-negative long — identical to
    * `conv(substring(md5(x),1,15),16,10)` / DuckDB
    * `CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)`. */
  def hash60(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    md.update(bytes)
    val d = outBufs.get()
    md.digest(d, 0, 16)
    var h = 0L
    var k = 0
    while (k < 7) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
    (h << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](60)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hash60(tokens.getUTF8String(i).getBytes)
        var j = 0
        while (j < 60) {
          votes(j) += (((h >>> j) & 1L).toInt << 1) - 1
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 60) { if (votes(j) > 0) fp |= 1L << j; j += 1 }
    fp
  }
}

/** `hash60_md5(bytes)` — first 60 bits of md5 as a non-negative long in
  * one native codegen pass: bit-identical to the portable
  * `conv(substring(md5(x),1,15),16,10)` / DuckDB
  * `CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)` formulation
  * [[graft.ext.Text.hash60]] used to build, WITHOUT the per-row
  * 32-char hex string, the substring slice, the radix-conversion
  * string, and the string→long cast that chain allocated (hash60 runs
  * on every exploded shingle/line/window/url row of the dedup and
  * curation families — the engine's hottest scalar). Strings arrive
  * as their UTF-8 bytes via the same implicit String→Binary cast
  * `md5()` itself uses, so semantics are unchanged for every input
  * the old chain accepted. */
case class Hash60Md5(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case org.apache.spark.sql.types.BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hash60_md5 requires string or binary, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hash60_md5"

  private def isString = child.dataType == StringType

  override def nullSafeEval(input: Any): Any =
    if (isString)
      SimHashUtil.hash60(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
    else SimHashUtil.hash60(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (isString)
      defineCodeGen(ctx, ev,
        c => s"graft.functions.SimHashUtil.hash60($c.getBytes())")
    else
      defineCodeGen(ctx, ev, c => s"graft.functions.SimHashUtil.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60Md5 =
    copy(child = newChild)
}

/** Function registration: per-session (for library callers) and via
  * `SparkSessionExtensions` (`spark.sql.extensions=graft.functions.GraftSparkExtensions`). */
object GraftFunctions {
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      (exprs: Seq[Expression]) => SimHash60(exprs.head)),
    (FunctionIdentifier("hash60_md5"),
      new ExpressionInfo(classOf[Hash60Md5].getName, "hash60_md5"),
      (exprs: Seq[Expression]) => Hash60Md5(exprs.head)),
    (FunctionIdentifier("minhash64"),
      new ExpressionInfo(classOf[MinHash64].getName, "minhash64"),
      (exprs: Seq[Expression]) => MinHash64(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue)),
    (FunctionIdentifier("rhplsh"),
      new ExpressionInfo(classOf[RhpLsh].getName, "rhplsh"),
      (exprs: Seq[Expression]) => RhpLsh(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue,
        exprs(2).eval().asInstanceOf[Number].intValue)),
    (FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[Expression]) => WordShingles(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue)),
    (FunctionIdentifier("min_md5"),
      new ExpressionInfo(classOf[MinMd5].getName, "min_md5"),
      (exprs: Seq[Expression]) => MinMd5(exprs.head)),
    (FunctionIdentifier("word_profile"),
      new ExpressionInfo(classOf[WordProfile].getName, "word_profile"),
      (exprs: Seq[Expression]) => WordProfile(exprs.head)),
    (FunctionIdentifier("tok_profile"),
      new ExpressionInfo(classOf[TokProfile].getName, "tok_profile"),
      (exprs: Seq[Expression]) => TokProfile(exprs.head)),
    (FunctionIdentifier("word_tokens"),
      new ExpressionInfo(classOf[WordTokens].getName, "word_tokens"),
      (exprs: Seq[Expression]) => WordTokens(exprs.head)),
    (FunctionIdentifier("freq_stats"),
      new ExpressionInfo(classOf[FreqStats].getName, "freq_stats"),
      (exprs: Seq[Expression]) => FreqStats(exprs.head)),
    (FunctionIdentifier("cis2_decode"),
      new ExpressionInfo(classOf[Cis2Decode].getName, "cis2_decode"),
      (exprs: Seq[Expression]) => Cis2Decode(exprs.head)),
    (FunctionIdentifier("cis2_encode"),
      new ExpressionInfo(classOf[Cis2Encode].getName, "cis2_encode"),
      (exprs: Seq[Expression]) => Cis2Encode(exprs(0), exprs(1), exprs(2), exprs(3))),
    (FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      (exprs: Seq[Expression]) => BloomMightContain(exprs(0), exprs(1))),
    (FunctionIdentifier("media_dims"),
      new ExpressionInfo(classOf[MediaDims].getName, "media_dims"),
      (exprs: Seq[Expression]) => MediaDims(exprs.head)),
    (FunctionIdentifier("html_text"),
      new ExpressionInfo(classOf[HtmlText].getName, "html_text"),
      (exprs: Seq[Expression]) => HtmlText(exprs.head)),
    (FunctionIdentifier("unicode_norm"),
      new ExpressionInfo(classOf[UnicodeNorm].getName, "unicode_norm"),
      (exprs: Seq[Expression]) => UnicodeNorm(exprs.head,
        exprs(1).eval().asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
          .toString)),
    (FunctionIdentifier("tf_feat_i64"),
      new ExpressionInfo(classOf[TfFeatI64].getName, "tf_feat_i64"),
      (exprs: Seq[Expression]) => TfFeatI64(exprs(0), exprs(1))),
    (FunctionIdentifier("tf_feat_f32"),
      new ExpressionInfo(classOf[TfFeatF32].getName, "tf_feat_f32"),
      (exprs: Seq[Expression]) => TfFeatF32(exprs(0), exprs(1))),
    (FunctionIdentifier("tf_feat_bytes"),
      new ExpressionInfo(classOf[TfFeatBytes].getName, "tf_feat_bytes"),
      (exprs: Seq[Expression]) => TfFeatBytes(exprs(0), exprs(1))),
    (FunctionIdentifier("script_profile"),
      new ExpressionInfo(classOf[ScriptProfile].getName, "script_profile"),
      (exprs: Seq[Expression]) => ScriptProfile(exprs.head)),
    (FunctionIdentifier("gopher_profile"),
      new ExpressionInfo(classOf[GopherProfile].getName, "gopher_profile"),
      (exprs: Seq[Expression]) => GopherProfile(exprs.head)),
    (FunctionIdentifier("line_rep_profile"),
      new ExpressionInfo(classOf[LineRepProfile].getName, "line_rep_profile"),
      (exprs: Seq[Expression]) => LineRepProfile(exprs.head)),
    (FunctionIdentifier("c4_profile"),
      new ExpressionInfo(classOf[C4Profile].getName, "c4_profile"),
      (exprs: Seq[Expression]) => C4Profile(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue)),
    (FunctionIdentifier("code_profile"),
      new ExpressionInfo(classOf[CodeProfile].getName, "code_profile"),
      (exprs: Seq[Expression]) => CodeProfile(exprs.head)))

  /** Registers only if absent, so a user's own temp function of the same
    * name is never silently replaced and repeated calls are no-ops. */
  def register(spark: SparkSession): Unit = all.foreach { case (id, _, builder) =>
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(id)) {
      reg.createOrReplaceTempFunction(id.funcName, builder, "built-in")
    }
  }
}

class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
