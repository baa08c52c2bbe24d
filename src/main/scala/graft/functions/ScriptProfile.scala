package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `script_profile(text)` — one-pass Unicode SCRIPT census of a
  * document: per-codepoint counts for the eight scripts that cover the
  * bulk of web text (Latin, Cyrillic, Greek, Arabic, Devanagari, Han,
  * Kana = Hiragana+Katakana, Hangul) plus digits, whitespace, and
  * everything else. The script-consistency check of multilingual
  * curation: a doc whose TAGGED language and DOMINANT script disagree
  * (a "russian" doc that is 90% Latin, a "japanese" doc with no kana)
  * is mislabeled or mojibake, and encoding damage shows up as an
  * `n_other` spike. Classification is the JDK's
  * `Character.UnicodeScript` (public Unicode property data), iterated
  * by CODE POINT so astral characters count once, never as surrogate
  * halves. Digits and whitespace are split out FIRST (both are script
  * COMMON — folding them into `other` would make every digit-heavy doc
  * look damaged).
  *
  * One codegen'd loop per row ([[WordProfile]]'s execution idiom) — a
  * pure narrow projection that runs at scan speed at any corpus
  * size. */
case class ScriptProfile(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"script_profile requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ScriptProfileUtil.schema
  override def prettyName: String = "script_profile"

  override def nullSafeEval(input: Any): Any =
    ScriptProfileUtil.profile(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ScriptProfileUtil.profile($c)")

  override protected def withNewChildInternal(newChild: Expression): ScriptProfile =
    copy(child = newChild)
}

/** Static helper referenced from generated code. */
object ScriptProfileUtil {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  /** Field order is the operator contract — [[graft.ext.TextAnalysis
    * .scriptProfile]] flattens by these names and its dominance
    * tiebreak follows this order. */
  val schema: StructType = StructType(Seq(
    StructField("n_cp", IntegerType, nullable = false),
    StructField("n_latin", IntegerType, nullable = false),
    StructField("n_cyrillic", IntegerType, nullable = false),
    StructField("n_greek", IntegerType, nullable = false),
    StructField("n_arabic", IntegerType, nullable = false),
    StructField("n_devanagari", IntegerType, nullable = false),
    StructField("n_han", IntegerType, nullable = false),
    StructField("n_kana", IntegerType, nullable = false),
    StructField("n_hangul", IntegerType, nullable = false),
    StructField("n_digit", IntegerType, nullable = false),
    StructField("n_space", IntegerType, nullable = false),
    StructField("n_other", IntegerType, nullable = false)))

  def profile(text: UTF8String): GenericInternalRow = {
    val s = text.toString
    var cp = 0
    var latin = 0; var cyr = 0; var greek = 0; var arabic = 0
    var deva = 0; var han = 0; var kana = 0; var hangul = 0
    var digit = 0; var space = 0; var other = 0
    var i = 0
    while (i < s.length) {
      val c = s.codePointAt(i)
      cp += 1
      if (Character.isDigit(c)) digit += 1
      else if (Character.isWhitespace(c)) space += 1
      else Character.UnicodeScript.of(c) match {
        case Character.UnicodeScript.LATIN => latin += 1
        case Character.UnicodeScript.CYRILLIC => cyr += 1
        case Character.UnicodeScript.GREEK => greek += 1
        case Character.UnicodeScript.ARABIC => arabic += 1
        case Character.UnicodeScript.DEVANAGARI => deva += 1
        case Character.UnicodeScript.HAN => han += 1
        case Character.UnicodeScript.HIRAGANA |
             Character.UnicodeScript.KATAKANA => kana += 1
        case Character.UnicodeScript.HANGUL => hangul += 1
        case _ => other += 1
      }
      i += Character.charCount(c)
    }
    new GenericInternalRow(Array[Any](cp, latin, cyr, greek, arabic, deva,
      han, kana, hangul, digit, space, other))
  }
}
