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

/** `word_profile(words)` — one-pass word statistics for the text-
  * analysis operators: counts, distinct count, summed/max length, and
  * the four fixed stopword-profile hit counts used by language id and
  * quality scoring. Replaces a chain of interpreted HOFs
  * (`size(filter(isInCollection))` per language, `aggregate` for
  * sum/max, `array_distinct`) with a single codegen'd loop; semantics
  * are pinned equal to the HOF formulation by spec, and the DuckDB
  * oracles are unchanged. */
case class WordProfile(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_profile requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = WordStatsUtil.profileSchema
  override def prettyName: String = "word_profile"

  override def nullSafeEval(input: Any): Any =
    WordStatsUtil.profile(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordStatsUtil.profile($c)")

  override protected def withNewChildInternal(newChild: Expression): WordProfile =
    copy(child = newChild)
}

/** `tok_profile(tokens)` — token count + punctuation-token count in one
  * pass. A token from [[graft.ext.Text.TokenRe]] is either a word run
  * or a single non-word char, so "punctuation" = first byte outside
  * [0-9A-Za-z_] — no per-token regex (`rlike`) needed. */
case class TokProfile(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tok_profile requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = WordStatsUtil.tokSchema
  override def prettyName: String = "tok_profile"

  override def nullSafeEval(input: Any): Any =
    WordStatsUtil.tokProfile(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordStatsUtil.tokProfile($c)")

  override protected def withNewChildInternal(newChild: Expression): TokProfile =
    copy(child = newChild)
}

/** Static helpers referenced from generated code. */
object WordStatsUtil {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

  val profileSchema: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_uniq", IntegerType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("max_len", LongType, nullable = false),
    StructField("s_en", IntegerType, nullable = false),
    StructField("s_es", IntegerType, nullable = false),
    StructField("s_fr", IntegerType, nullable = false),
    StructField("s_de", IntegerType, nullable = false)))

  val tokSchema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false)))

  // The fixed stopword profiles of TextAnalysis (operator spec constants).
  private def set(ws: String*): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    ws.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  private val En = set("the", "and", "of", "to", "in", "is", "a", "for")
  private val Es = set("el", "la", "de", "que", "y", "en", "un", "los")
  private val Fr = set("le", "la", "et", "les", "des", "un", "une", "du")
  private val De = set("der", "die", "und", "das", "ist", "ein", "von", "mit")

  def profile(words: ArrayData): GenericInternalRow = {
    val n = words.numElements()
    val uniq = new java.util.HashSet[UTF8String]()
    var sumLen = 0L
    var maxLen = 0L
    var en = 0; var es = 0; var fr = 0; var de = 0
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i)
        uniq.add(w)
        val len = w.numChars()
        sumLen += len
        if (len > maxLen) maxLen = len
        if (En.contains(w)) en += 1
        if (Es.contains(w)) es += 1
        if (Fr.contains(w)) fr += 1
        if (De.contains(w)) de += 1
      }
      i += 1
    }
    new GenericInternalRow(
      Array[Any](n, uniq.size(), sumLen, maxLen, en, es, fr, de))
  }

  def tokProfile(toks: ArrayData): GenericInternalRow = {
    val n = toks.numElements()
    var punct = 0
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        val b = if (t.numBytes() > 0) t.getByte(0) else 0
        val word = (b >= '0' && b <= '9') || (b >= 'A' && b <= 'Z') ||
          (b >= 'a' && b <= 'z') || b == '_'
        if (!word) punct += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](n, punct))
  }
}

/** `word_tokens(text)` — the [[graft.ext.Text.TokenRe]] tokenizer
  * (`[0-9A-Za-z_]+|[^0-9A-Za-z_ ]`) as a native byte scanner: ASCII word
  * runs become one token, a space is a separator, and ANY other
  * character (punctuation, tabs/newlines, non-ASCII) is a single token.
  *
  * Non-BMP caveat, resolved in the ORACLE's favour: this scanner (and
  * DuckDB's RE2-based `regexp_extract_all`) operates on Unicode CODE
  * POINTS, so an astral-plane character (e.g. an emoji) is one token;
  * java.util.regex operates on UTF-16 code units and would split it
  * into two unpaired-surrogate tokens. The scanner deliberately matches
  * the DuckDB oracle — the engine the correctness gate compares against
  * — not the JVM regex quirk; the spec equivalence test therefore pins
  * equality on BMP text only. Replaces `regexp_extract_all` (a
  * java.util.regex machine per row) in the text hot path. */
case class WordTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_tokens requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_tokens"

  override def nullSafeEval(input: Any): Any =
    TokenizeUtil.tokens(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenizeUtil.tokens($c)")

  override protected def withNewChildInternal(newChild: Expression): WordTokens =
    copy(child = newChild)
}

/** Static helper referenced from generated code. */
object TokenizeUtil {

  private def isWordByte(b: Byte): Boolean =
    (b >= '0' && b <= '9') || (b >= 'A' && b <= 'Z') ||
      (b >= 'a' && b <= 'z') || b == '_'

  def tokens(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](16)
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if (isWordByte(b)) {
        val start = i
        i += 1
        while (i < n && isWordByte(bytes(i))) i += 1
        out += UTF8String.fromBytes(bytes, start, i - start)
      } else if (b == ' ') {
        i += 1
      } else {
        // one code point = one token ([^0-9A-Za-z_ ] matches any single
        // char); multi-byte UTF-8 sequences advance by the whole char
        val len = UTF8String.numBytesForFirstByte(b)
        val end = math.min(i + len, n)
        out += UTF8String.fromBytes(bytes, i, end - i)
        i = end
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** `freq_stats(strings)` — occurrence statistics of a string array in
  * one pass: total count, the count of the most frequent element, and
  * the number of occurrences belonging to elements seen more than once.
  * The building block for Gopher-style repetition quality filters
  * (top-n-gram fraction, duplicate-n-gram fraction) without exploding
  * n-grams through a shuffle: repetition is a PER-DOCUMENT property, so
  * it stays a narrow map. */
case class FreqStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"freq_stats requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = FreqStatsUtil.schema
  override def prettyName: String = "freq_stats"

  override def nullSafeEval(input: Any): Any =
    FreqStatsUtil.compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FreqStatsUtil.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): FreqStats =
    copy(child = newChild)
}

/** Static helper referenced from generated code. */
object FreqStatsUtil {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("max_count", IntegerType, nullable = false),
    StructField("dup_n", IntegerType, nullable = false)))

  def compute(arr: ArrayData): GenericInternalRow = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Int]()
    var total = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        total += 1
        counts.merge(arr.getUTF8String(i), 1, (a, b) => a + b)
      }
      i += 1
    }
    var maxCount = 0
    var dupN = 0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c > maxCount) maxCount = c
      if (c > 1) dupN += c
    }
    new GenericInternalRow(Array[Any](total, maxCount, dupN))
  }
}
