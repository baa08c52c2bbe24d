package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `code_profile(text)` — every raw counter of the StarCoder/BigCode
  * code-data quality battery ([[graft.ext.TextAnalysis.codeQuality]])
  * in ONE native pass over the file.
  *
  * Counters (lines split on `\n` with TRAILING empties preserved —
  * Java `split` with limit -1 / DuckDB `string_split` semantics, NOT
  * Java's default `split` which drops trailing empty strings
  * ("a\n" → 2 lines here, 1 under the default) — so an empty file is
  * ONE empty line and the downstream ratios never divide by zero;
  * lengths in codepoints):
  *  - n_lines, max_ll (longest line), sum_ll (total line chars —
  *    the file's char count excluding newlines);
  *  - n_comment: lines whose first non-space/tab chars are `//` or
  *    `#` (the two comment markers the fixture synthesizes; the
  *    published filters use language-aware markers, which at engine
  *    level is just a different prefix set);
  *  - n_alnum: `[0-9A-Za-z]` chars in the whole file (the
  *    alphanumeric-fraction rule);
  *  - hex_chars: summed length of MAXIMAL `[0-9A-Fa-f]` runs of
  *    length >= 16 (hex-blob share);
  *  - b64_chars: summed length of MAXIMAL `[A-Za-z0-9+/=]` runs of
  *    length >= 40 (base64-blob share).
  * Maximal-run semantics match a greedy regex (`[0-9A-Fa-f]{16,}`)
  * exactly — the DuckDB oracle uses `regexp_extract_all` with those
  * patterns, and greedy leftmost matching consumes each maximal run
  * whole — so both engines price the same blobs.
  */
case class CodeProfile(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"code_profile requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = CodeProfileUtil.schema
  override def prettyName: String = "code_profile"

  override def nullSafeEval(input: Any): Any =
    CodeProfileUtil.profile(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CodeProfileUtil.profile($c)")

  override protected def withNewChildInternal(newChild: Expression): CodeProfile =
    copy(child = newChild)
}

/** Static helper referenced from generated code. */
object CodeProfileUtil {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("n_lines", IntegerType, nullable = false),
    StructField("max_ll", IntegerType, nullable = false),
    StructField("sum_ll", LongType, nullable = false),
    StructField("n_comment", IntegerType, nullable = false),
    StructField("n_alnum", LongType, nullable = false),
    StructField("hex_chars", LongType, nullable = false),
    StructField("b64_chars", LongType, nullable = false)))

  private def isAlnum(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  private def isB64(c: Char): Boolean =
    isAlnum(c) || c == '+' || c == '/' || c == '='

  def profile(text: UTF8String): GenericInternalRow = {
    val s = text.toString
    val L = s.length
    var nLines = 0
    var maxLl = 0
    var sumLl = 0L
    var nComment = 0
    var nAlnum = 0L
    var hexChars = 0L
    var b64Chars = 0L
    // per-run state: run lengths in codepoints; a surrogate pair is
    // never in either ASCII class, so char-wise run tracking is exact
    var hexRun = 0L
    var b64Run = 0L
    def closeRuns(): Unit = {
      if (hexRun >= 16) hexChars += hexRun
      if (b64Run >= 40) b64Chars += b64Run
      hexRun = 0; b64Run = 0
    }
    def line(a: Int, b: Int): Unit = {
      nLines += 1
      val len = s.codePointCount(a, b)
      if (len > maxLl) maxLl = len
      sumLl += len
      // comment marker after leading spaces/tabs
      var j = a
      while (j < b && (s.charAt(j) == ' ' || s.charAt(j) == '\t')) j += 1
      if (j < b && (s.charAt(j) == '#' ||
          (j + 1 < b && s.charAt(j) == '/' && s.charAt(j + 1) == '/')))
        nComment += 1
    }
    var start = 0
    var i = 0
    while (i < L) {
      val c = s.charAt(i)
      if (c == '\n') {
        line(start, i)
        start = i + 1
        closeRuns()
      } else {
        if (isAlnum(c)) nAlnum += 1
        if (isHex(c)) hexRun += 1 else { if (hexRun >= 16) hexChars += hexRun; hexRun = 0 }
        if (isB64(c)) b64Run += 1 else { if (b64Run >= 40) b64Chars += b64Run; b64Run = 0 }
      }
      i += 1
    }
    line(start, L)
    closeRuns()
    new GenericInternalRow(Array[Any](nLines, maxLl, sumLl, nComment,
      nAlnum, hexChars, b64Chars))
  }
}
