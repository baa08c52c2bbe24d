package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization — the pre-tokenization pass every large text
  * pipeline runs so that byte-identical MEANING is byte-identical TEXT:
  * a composed "é" (U+00E9) and its decomposed twin (e + U+0301) hash
  * apart, shingle apart, and dedup apart unless normalized first; NFKC
  * additionally folds compatibility forms (ﬁ → fi, full-width Ａ → A,
  * ² → 2) the way tokenizer vocabularies expect.
  *
  * The JDK's `java.text.Normalizer` implements the (public) Unicode
  * UAX #15 forms, so the semantics need no third-party dependency. The
  * fast path matters at 100 TB: web text is overwhelmingly ALREADY
  * normalized, so [[UnicodeNormUtil.norm]] first runs the allocation-free
  * `isNormalized` scan and returns the INPUT UTF8String untouched when
  * it passes — the rewrite allocates only for the rows that need it.
  */
object UnicodeNormUtil {

  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  def norm(s: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }
}

/** `unicode_norm(text, 'NFC'|'NFD'|'NFKC'|'NFKD')` → normalized text.
  * The form is a plan-time literal, so codegen binds the Form constant
  * directly and the whole expression stays inside whole-stage codegen. */
case class UnicodeNorm(child: Expression, form: String)
    extends UnaryExpression {

  require(UnicodeNormUtil.Forms(form),
    s"unicode_norm form must be one of ${UnicodeNormUtil.Forms}, got $form")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_norm requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "unicode_norm"

  @transient private lazy val nf = java.text.Normalizer.Form.valueOf(form)

  override def nullSafeEval(input: Any): Any =
    UnicodeNormUtil.norm(input.asInstanceOf[UTF8String], nf)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnicodeNormUtil.norm($c, java.text.Normalizer.Form.$form)")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNorm =
    copy(child = newChild)
}
