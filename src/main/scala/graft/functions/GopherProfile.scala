package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `gopher_profile(text)` — every raw counter of the Gopher rule
  * battery ([[graft.ext.TextAnalysis.gopherRules]]) in ONE native pass
  * over the page.
  *
  * Semantically pinned to the HOF formulation it replaces (and to the
  * unchanged DuckDB oracle): words are `split(lower(trim(text)),
  * "[ \n]+")` — Java regex-split semantics, so a page starting or
  * ending with a separator run contributes an empty word and an empty
  * page is ONE empty word (never a division hazard downstream); lines
  * are `split(text, "\n")` with empties preserved. The HOF version
  * materialized the word and line arrays and walked them up to six
  * times through interpreted lambdas; this is two scans (lowered words
  * pass, original lines/symbols pass), no arrays, inside whole-stage
  * codegen.
  *
  * Output struct: (n_words, n_lines, wchars = summed word chars,
  * sym = `#` + non-overlapping `...` occurrences, bullets = lines
  * starting `- `/`* `/`• `, ellipsis = lines ending `...`/`…`,
  * alpha = words containing an ASCII letter (post-lowercase),
  * stop_hits = DISTINCT Gopher stop words present of the published 8).
  */
case class GopherProfile(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gopher_profile requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = GopherProfileUtil.schema
  override def prettyName: String = "gopher_profile"

  override def nullSafeEval(input: Any): Any =
    GopherProfileUtil.profile(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GopherProfileUtil.profile($c)")

  override protected def withNewChildInternal(newChild: Expression): GopherProfile =
    copy(child = newChild)
}

/** `line_rep_profile(text)` — the raw counters of Gopher's
  * duplicate-line/paragraph repetition rules
  * ([[graft.ext.TextAnalysis.gopherRepetition]]) in one native pass:
  * non-empty `\n` lines and non-empty `\n\n` paragraphs (Java
  * regex-split segmentation), each granularity's total count, total
  * chars, duplicate-occurrence count (occurrences beyond a string's
  * first) and duplicate-occurrence chars, via one hash map per
  * granularity. Replaces two split arrays walked through
  * `array_distinct` + two `aggregate` lambdas each. A page with no
  * non-empty line reports n_lines = 0 — the caller's ratio division
  * faults under ANSI exactly as the HOF formulation did (contract
  * unchanged). */
case class LineRepProfile(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"line_rep_profile requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = GopherProfileUtil.repSchema
  override def prettyName: String = "line_rep_profile"

  override def nullSafeEval(input: Any): Any =
    GopherProfileUtil.repProfile(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GopherProfileUtil.repProfile($c)")

  override protected def withNewChildInternal(
      newChild: Expression): LineRepProfile = copy(child = newChild)
}

/** `c4_profile(text, minWords)` — the whole C4 page-cleaning pass
  * ([[graft.ext.Curation.c4Clean]]) in one native pass: line keep
  * rules (terminal `.` `!` `?` `"`, at least minWords whitespace
  * words, no case-insensitive "javascript"), the page-level
  * lorem-ipsum / `{` drop, and the reassembled clean text. Semantics
  * pinned byte-exact to the HOF formulation (Java split, Spark
  * `lower()` via UTF8String.toLowerCase) by the equivalence spec;
  * the DuckDB oracle is unchanged. */
case class C4Profile(child: Expression, minWords: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"c4_profile requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = GopherProfileUtil.c4Schema
  override def prettyName: String = "c4_profile"

  override def nullSafeEval(input: Any): Any =
    GopherProfileUtil.c4Profile(input.asInstanceOf[UTF8String], minWords)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GopherProfileUtil.c4Profile($c, $minWords)")

  override protected def withNewChildInternal(newChild: Expression): C4Profile =
    copy(child = newChild)
}

/** Static helper referenced from generated code. */
object GopherProfileUtil {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_lines", IntegerType, nullable = false),
    StructField("wchars", LongType, nullable = false),
    StructField("sym", LongType, nullable = false),
    StructField("bullets", IntegerType, nullable = false),
    StructField("ellipsis", IntegerType, nullable = false),
    StructField("alpha", IntegerType, nullable = false),
    StructField("stop_hits", IntegerType, nullable = false)))

  val repSchema: StructType = StructType(Seq(
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_pars", IntegerType, nullable = false),
    StructField("line_chars", LongType, nullable = false),
    StructField("par_chars", LongType, nullable = false),
    StructField("dup_lines", IntegerType, nullable = false),
    StructField("dup_line_chars", LongType, nullable = false),
    StructField("dup_pars", IntegerType, nullable = false),
    StructField("dup_par_chars", LongType, nullable = false)))

  val c4Schema: StructType = StructType(Seq(
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false),
    StructField("page_ok", org.apache.spark.sql.types.BooleanType,
      nullable = false),
    StructField("clean_text", StringType, nullable = false)))

  /** Spark `lower()` semantics exactly (UTF8String.toLowerCase — the
    * HOF formulation's `contains(lower(x), …)` path). */
  private def low(s: String): String =
    UTF8String.fromString(s).toLowerCase.toString

  /** `size(split(trim(l), ' +'))` under Java regex-split semantics
    * over s[from, until): an empty trimmed line is ONE empty token;
    * otherwise the count of space-run-separated tokens. Offset-based —
    * no substring allocation in the per-line hot path. */
  private def wordCount(s: String, from: Int, until: Int): Int = {
    var a = from
    var b = until
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    if (a == b) return 1
    var n = 1
    var i = a
    var inRun = false
    while (i < b) {
      if (s.charAt(i) == ' ') { if (!inRun) { n += 1; inRun = true } }
      else inRun = false
      i += 1
    }
    n
  }

  def c4Profile(text: UTF8String, minWords: Int): GenericInternalRow = {
    val s = text.toString
    val lowAll = low(s)
    val pageOk = !lowAll.contains("lorem ipsum") && !s.contains("{")
    val sb = new java.lang.StringBuilder
    var nLines = 0
    var nKept = 0
    def line(a: Int, b: Int): Unit = {
      nLines += 1
      val len = b - a
      if (len > 0) {
        val last = s.charAt(b - 1)
        if ((last == '.' || last == '!' || last == '?' || last == '"') &&
            wordCount(s, a, b) >= minWords &&
            !low(s.substring(a, b)).contains("javascript")) {
          nKept += 1
          // n_kept is reported even on dropped pages, but the thrown-
          // away clean text of a dropped page is not worth building
          if (pageOk) {
            if (sb.length > 0) sb.append('\n')
            sb.append(s, a, b)
          }
        }
      }
    }
    var start = 0
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\n') { line(start, i); start = i + 1 }
      i += 1
    }
    line(start, s.length)
    new GenericInternalRow(Array[Any](nLines, nKept, pageOk,
      UTF8String.fromString(if (pageOk) sb.toString else "")))
  }

  /** One granularity's pass: segment on the separator (1 = `\n`,
    * 2 = `\n\n`, Java regex-split boundaries), keep non-empty
    * segments, and return (n, chars, dupN, dupChars). */
  private def repPass(s: String, sepLen: Int): (Int, Long, Int, Long) = {
    val seen = new java.util.HashMap[String, Integer]()
    var n = 0
    var chars = 0L
    var distinctChars = 0L
    var start = 0
    var i = 0
    val L = s.length
    def seg(a: Int, b: Int): Unit =
      if (b > a) {
        val t = s.substring(a, b)
        n += 1
        val c = s.codePointCount(a, b)
        chars += c
        if (seen.putIfAbsent(t, 1) == null) distinctChars += c
      }
    while (i < L) {
      if (s.charAt(i) == '\n' &&
          (sepLen == 1 || (i + 1 < L && s.charAt(i + 1) == '\n'))) {
        seg(start, i)
        i += sepLen
        start = i
      } else i += 1
    }
    seg(start, L)
    (n, chars, n - seen.size, chars - distinctChars)
  }

  def repProfile(text: UTF8String): GenericInternalRow = {
    val s = text.toString
    val (nl, lc, dl, dlc) = repPass(s, 1)
    val (np, pc, dp, dpc) = repPass(s, 2)
    new GenericInternalRow(Array[Any](nl, np, lc, pc, dl, dlc, dp, dpc))
  }

  // Gopher's published required-stop-word list (Rae et al. 2021 A1.1).
  private val Stops = Array("the", "be", "to", "of", "and", "that",
    "have", "with")

  private def isSep(c: Char): Boolean = c == ' ' || c == '\n'

  def profile(text: UTF8String): GenericInternalRow = {
    // words operate on lower(trim(text)) — UTF8String's own trim
    // (spaces only) and toLowerCase, the exact Spark Lower/StringTrim
    // semantics the HOF formulation inherited
    val low = text.trim().toLowerCase.toString
    var nWords = 0
    var wchars = 0L
    var alpha = 0
    var stopMask = 0
    var start = 0
    var i = 0
    val L = low.length
    def emit(s: Int, e: Int): Unit = {
      nWords += 1
      wchars += low.codePointCount(s, e)
      var hasAlpha = false
      var j = s
      while (j < e && !hasAlpha) {
        val c = low.charAt(j)
        if (c >= 'a' && c <= 'z') hasAlpha = true
        j += 1
      }
      if (hasAlpha) alpha += 1
      val len = e - s
      if (len >= 2 && len <= 4) {
        var k = 0
        while (k < Stops.length) {
          if ((stopMask & (1 << k)) == 0 && low.regionMatches(s, Stops(k), 0, len) &&
              Stops(k).length == len) stopMask |= 1 << k
          k += 1
        }
      }
    }
    while (i < L) {
      if (isSep(low.charAt(i))) {
        emit(start, i)
        while (i < L && isSep(low.charAt(i))) i += 1
        start = i
      } else i += 1
    }
    emit(start, L) // final token; "" when the page ends in a separator

    // lines + symbols operate on the ORIGINAL text
    val orig = text.toString
    var nLines = 0
    var bullets = 0
    var ellipsis = 0
    var sym = 0L
    var ls = 0
    var p = 0
    val OL = orig.length
    def line(s: Int, e: Int): Unit = {
      nLines += 1
      val len = e - s
      if (len >= 2) {
        val c0 = orig.charAt(s)
        if ((c0 == '-' || c0 == '*' || c0 == '•') &&
            orig.charAt(s + 1) == ' ') bullets += 1
      }
      if ((len >= 3 && orig.charAt(e - 1) == '.' && orig.charAt(e - 2) == '.' &&
            orig.charAt(e - 3) == '.') ||
          (len >= 1 && orig.charAt(e - 1) == '…')) ellipsis += 1
    }
    while (p < OL) {
      val c = orig.charAt(p)
      if (c == '\n') { line(ls, p); ls = p + 1; p += 1 }
      else if (c == '#') { sym += 1; p += 1 }
      else if (c == '.' && p + 2 < OL && orig.charAt(p + 1) == '.' &&
               orig.charAt(p + 2) == '.') {
        // non-overlapping "..." exactly like regexp_count's scan
        sym += 1; p += 3
      } else p += 1
    }
    line(ls, OL)

    new GenericInternalRow(Array[Any](nWords, nLines, wchars, sym,
      bullets, ellipsis, alpha, Integer.bitCount(stopMask)))
  }
}
