package graft.sources

import java.io.{ByteArrayOutputStream, EOFException, InputStream}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Web-crawl ingestion: the WARC container (ISO 28500 — the format
  * large public crawls are published in) parsed down to the
  * `documents` shape the curation/dedup operators consume.
  *
  * Reference behavior target: the same raw-dump → quarantine-or-emit
  * contract as [[TextCorpus]] (`readJsonl`/`readCsv`), applied to the
  * remaining corpus format a training pipeline actually receives.
  *
  * Format facts the parser relies on (all from the public spec):
  *  - a WARC file is a sequence of records; each record is a version
  *    line `WARC/1.x`, CRLF-separated named headers, a blank line, then
  *    exactly `Content-Length` bytes of block, then two CRLFs;
  *  - the `.warc.gz` convention compresses EACH RECORD as its own gzip
  *    member, members concatenated — `GZIPInputStream` consumes
  *    concatenated members natively, and record extents come from
  *    `Content-Length`, so one sequential decompressing scan recovers
  *    every record without needing member boundaries;
  *  - a `response` record whose Content-Type is `application/http`
  *    wraps a full HTTP response: status line, headers, blank line,
  *    payload. The HTTP status and Content-Type are split out; the
  *    payload is the entity bytes.
  *
  * Scale shape: one file = one task (the gzip stream is not
  * splittable — same trade as [[TextCorpus.readCsv]]'s multiline; the
  * crawl convention of ~1 GB segment files exists precisely so a
  * 100 TB crawl is tens of thousands of independent file-tasks).
  * Parsing is a single streaming pass per file — the decompressed
  * corpus is never materialized whole; only one record's payload is
  * resident at a time.
  *
  * Malformed input follows the quarantine contract: structural damage
  * (bad version line, truncated payload, absurd length) stops the scan
  * of THAT file and emits a synthetic `_corrupt` row carrying the file
  * offset and reason — never silently dropped, never aborting the job.
  */
object WarcCorpus {

  /** One parsed record; `httpStatus`/`httpContentType` are populated
    * only for `application/http` response records. For a `_corrupt`
    * row, `recordId` carries the reason and `offset` the position (in
    * the uncompressed stream) where parsing stopped. */
  final case class WarcRow(
      path: String, offset: Long, warc_type: String, record_id: String,
      target_uri: String, warc_date: String, content_type: String,
      http_status: Option[Int], http_content_type: Option[String],
      payload: Array[Byte])

  /** Max header-section bytes per record before declaring corruption —
    * a desynced scan otherwise "reads headers" through gigabytes. */
  private val MaxHeaderBytes = 1 << 20

  /** Parse every record of one WARC file (plain, record-gzipped, or
    * whole-file gzip/zstd — [[Unpack]] sniffs the magic).
    * Streaming: safe for payloads up to single-record memory. */
  def parseRecords(path: String, bytes: Array[Byte]): Seq[WarcRow] = {
    val in: InputStream = Unpack.stream(bytes)
    val out = Seq.newBuilder[WarcRow]
    val counted = new CountingStream(in)
    var done = false
    while (!done) {
      parseOne(path, counted) match {
        case Right(Some(row)) => out += row
        case Right(None) => done = true // clean EOF
        case Left(reason) =>
          out += WarcRow(path, counted.count, "_corrupt", reason,
            null, null, null, None, None, Array.emptyByteArray)
          done = true
      }
    }
    out.result()
  }

  private final class CountingStream(in: InputStream) extends InputStream {
    var count: Long = 0L
    override def read(): Int = {
      val b = in.read(); if (b >= 0) count += 1; b
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      val n = in.read(b, off, len); if (n > 0) count += n; n
    }
  }

  /** Read one CRLF-terminated line as ISO-8859-1 (header sections are
    * ASCII per the spec; 8859-1 is the byte-transparent superset). */
  private def readLine(in: InputStream, limit: Int): Option[String] = {
    val sb = new java.lang.StringBuilder(96)
    var prev = -1
    var c = in.read()
    if (c < 0) return None
    while (c >= 0 && !(prev == '\r' && c == '\n') && sb.length < limit) {
      if (prev >= 0) sb.append(prev.toChar)
      prev = c
      c = in.read()
    }
    if (prev == '\r' && c == '\n') Some(sb.toString)
    else Some(sb.append(prev.toChar).toString) // EOF mid-line: best effort
  }

  /** None = clean EOF; Left = structural corruption. */
  private def parseOne(path: String,
                       in: CountingStream): Either[String, Option[WarcRow]] = {
    val start = in.count
    // tolerate extra CRLFs between records (common in the wild)
    var version: String = null
    var blanks = 0
    while (version == null) {
      readLine(in, 256) match {
        case None => return Right(None)
        case Some("") =>
          blanks += 1
          if (blanks > 64) return Left(s"run of blank lines at offset $start")
        case Some(v) if v.startsWith("WARC/") => version = v
        case Some(other) =>
          return Left(s"expected WARC/ version line at offset $start, got '${
            other.take(40)}'")
      }
    }
    // named headers to the blank line; names are case-insensitive
    val headers = scala.collection.mutable.Map.empty[String, String]
    var headerBytes = 0L
    var blank = false
    while (!blank) {
      readLine(in, MaxHeaderBytes) match {
        case None => return Left(s"EOF inside header block at offset $start")
        case Some("") => blank = true
        case Some(line) =>
          headerBytes += line.length + 2
          if (headerBytes > MaxHeaderBytes)
            return Left(s"header block exceeds ${MaxHeaderBytes}B at offset $start")
          val k = line.indexOf(':')
          if (k > 0) headers.update(
            line.substring(0, k).trim.toLowerCase(java.util.Locale.ROOT),
            line.substring(k + 1).trim)
      }
    }
    val lenStr = headers.get("content-length") match {
      case Some(v) => v
      case None => return Left(s"record at offset $start has no Content-Length")
    }
    val len =
      try lenStr.toLong
      catch { case _: NumberFormatException =>
        return Left(s"bad Content-Length '$lenStr' at offset $start") }
    if (len < 0 || len > Int.MaxValue)
      return Left(s"absurd Content-Length $len at offset $start")
    val block = new Array[Byte](len.toInt)
    try {
      var read = 0
      while (read < block.length) {
        val n = in.read(block, read, block.length - read)
        if (n < 0) throw new EOFException
        read += n
      }
    } catch { case _: EOFException =>
      return Left(s"truncated block (wanted $len bytes) at offset $start") }

    val contentType = headers.getOrElse("content-type", "")
    val (status, httpCt, payload) =
      if (contentType.toLowerCase(java.util.Locale.ROOT)
            .startsWith("application/http")) httpSplit(block)
      else (None, None, block)
    Right(Some(WarcRow(
      path = path,
      offset = start,
      warc_type = headers.getOrElse("warc-type", ""),
      record_id = headers.getOrElse("warc-record-id", ""),
      target_uri = headers.getOrElse("warc-target-uri", null),
      warc_date = headers.getOrElse("warc-date", null),
      content_type = contentType,
      http_status = status,
      http_content_type = httpCt,
      payload = payload)))
  }

  /** Undo HTTP/1.1 chunked transfer-encoding: `hex-size[;ext]CRLF data
    * CRLF` repeated, a `0` chunk ends the body (trailers ignored).
    * Crawls capture the wire bytes, so chunked framing is routine in
    * the wild. Malformed framing returns the input unchanged — best
    * effort beats dropping the page. */
  private[sources] def dechunk(b: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(b.length)
    var i = 0
    while (i < b.length) {
      // hex size up to ';' (chunk extension) or CR
      var j = i
      var size = 0L
      var sawHex = false
      while (j < b.length && b(j) != '\r' && b(j) != ';') {
        val d = Character.digit(b(j).toChar, 16)
        if (d < 0 || size > (Long.MaxValue >> 4)) return b
        size = (size << 4) | d
        sawHex = true
        j += 1
      }
      if (!sawHex || size > Int.MaxValue) return b
      while (j < b.length && b(j) != '\r') j += 1 // skip any extension
      if (j + 1 >= b.length || b(j + 1) != '\n') return b
      val dataStart = j + 2
      if (size == 0) return out.toByteArray // trailers, if any, ignored
      if (dataStart + size + 2 > b.length) return b // truncated chunk
      out.write(b, dataStart, size.toInt)
      if (b(dataStart + size.toInt) != '\r' ||
          b(dataStart + size.toInt + 1) != '\n') return b
      i = dataStart + size.toInt + 2
    }
    b // ran off the end without a terminal 0-chunk — malformed
  }

  /** Split an `application/http` block into (status, content-type,
    * entity bytes) — chunked transfer-encoding undone. A malformed
    * HTTP envelope keeps the whole block as payload with no status —
    * the record itself is still well-formed WARC, so it is NOT
    * corruption. */
  private def httpSplit(block: Array[Byte]): (Option[Int], Option[String], Array[Byte]) = {
    // find CRLFCRLF
    var i = 0
    var split = -1
    while (split < 0 && i + 3 < block.length) {
      if (block(i) == '\r' && block(i + 1) == '\n' &&
          block(i + 2) == '\r' && block(i + 3) == '\n') split = i
      i += 1
    }
    if (split < 0) return (None, None, block)
    val head = new String(block, 0, split, "ISO-8859-1")
    val lines = head.split("\r\n")
    val status = lines.headOption
      .filter(_.startsWith("HTTP/"))
      .flatMap { sl =>
        val parts = sl.split(" ", 3)
        if (parts.length >= 2 && parts(1).forall(_.isDigit) && parts(1).nonEmpty)
          Some(parts(1).toInt)
        else None
      }
    if (status.isEmpty) return (None, None, block)
    val hdrPairs = lines.iterator.drop(1)
      .map { l => val k = l.indexOf(':'); if (k > 0)
        (l.substring(0, k).trim.toLowerCase(java.util.Locale.ROOT),
          l.substring(k + 1).trim) else ("", "") }
      .toSeq
    val ct = hdrPairs.collectFirst { case ("content-type", v) => v }
    val chunked = hdrPairs.exists { case (k, v) =>
      k == "transfer-encoding" &&
        v.toLowerCase(java.util.Locale.ROOT).contains("chunked") }
    val entity = java.util.Arrays.copyOfRange(block, split + 4, block.length)
    (status, ct, if (chunked) dechunk(entity) else entity)
  }

  /** The 27 defined windows-1252 codepoints in 0x80–0x9F (the only
    * range where cp1252 and iso-8859-1 disagree) and their glyphs;
    * the five undefined bytes (81 8D 8F 90 9D) pass through. */
  private[sources] val Cp1252High: String =
    "\u0080\u0082\u0083\u0084\u0085\u0086\u0087\u0088\u0089\u008A" +
    "\u008B\u008C\u008E\u0091\u0092\u0093\u0094\u0095\u0096\u0097" +
    "\u0098\u0099\u009A\u009B\u009C\u009E\u009F"
  private[sources] val Cp1252Glyphs: String =
    "\u20AC\u201A\u0192\u201E\u2026\u2020\u2021\u02C6\u2030\u0160" +
    "\u2039\u0152\u017D\u2018\u2019\u201C\u201D\u2022\u2013\u2014" +
    "\u02DC\u2122\u0161\u203A\u0153\u017E\u0178"

  final case class WarcResult(records: DataFrame, corrupt: DataFrame)

  /** Read a directory of WARC files (plain `.warc` or record-gzipped
    * `.warc.gz`): `records` carries one row per parsed record with the
    * HTTP envelope split out, `corrupt` the per-file quarantine rows.
    * The scan is distributed (binaryFile source, one task per file)
    * and parsing streams each file once. */
  def readWarc(spark: SparkSession, path: String,
               pathGlob: String = "*.warc*"): WarcResult = {
    import spark.implicits._
    val rows = spark.read.format("binaryFile")
      .option("pathGlobFilter", pathGlob)
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) => parseRecords(p, bytes) }
      .toDF()
    WarcResult(
      records = rows.where(col("warc_type") =!= "_corrupt"),
      corrupt = rows.where(col("warc_type") === "_corrupt")
        .select(col("path"), col("offset"), col("record_id").as("reason")))
  }

  /** The crawl → corpus composition: successful (HTTP 200) HTML
    * response records extracted to plain text via the codegen
    * `html_text` pass, in the `documents` shape (`doc_id` = stable
    * URI hash, like [[TextCorpus.readFiles]]). Everything stays one
    * narrow zero-shuffle projection over the record scan.
    *
    * Payload bytes decode with WHATWG precedence (BOM > HTTP header's
    * `charset=` parameter > `<meta charset>` prescan of the first
    * 1024 bytes): latin-1 declarations decode as windows-1252 (its
    * superset — the rule every browser applies), a byte-order mark
    * wins over any declaration and is stripped, and anything else
    * falls back to UTF-8 (the dominant encoding). */
  def webDocuments(records: DataFrame): DataFrame =
    decodedPages(records).select(
      graft.ext.Text.hash60(col("target_uri")).as("doc_id"),
      col("target_uri").as("url"),
      col("warc_date").as("fetched"),
      expr("html_text(__page)").as("text"))

  /** The RAW-MARKUP sibling of [[webDocuments]]: same response gate
    * and charset handling, page kept as decoded HTML instead of
    * text-extracted — the frame the markup-level passes consume
    * ([[graft.ext.Curation.imageRefs]] → image-text pairing; link
    * extraction). Same narrow zero-shuffle projection, so it composes
    * into the streaming crawl feed identically. */
  def webPages(records: DataFrame): DataFrame =
    decodedPages(records).select(
      graft.ext.Text.hash60(col("target_uri")).as("doc_id"),
      col("target_uri").as("url"),
      col("warc_date").as("fetched"),
      col("__page").as("html"))

  /** Charset names decoded through the cp1252 translation path:
    * latin-1 declarations decode as windows-1252 (its superset — the
    * WHATWG rule every browser applies). */
  private val Cp1252Names =
    Seq("iso-8859-1", "latin1", "latin-1", "windows-1252", "cp1252")

  private val Utf8Bom = Array(0xEF, 0xBB, 0xBF).map(_.toByte)
  private val Utf16BeBom = Array(0xFE, 0xFF).map(_.toByte)
  private val Utf16LeBom = Array(0xFF, 0xFE).map(_.toByte)

  private def decodedPages(records: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(records.sparkSession)
    val headerCharset = regexp_extract(lower(col("http_content_type")),
      "charset=\"?([a-z0-9_\\-]+)", 1)
    // WHATWG prescan (HTML §13.2.3.2) for header-less pages: the first
    // 1024 payload bytes, read as latin-1 (the byte-transparent
    // superset — the prescan is ASCII-level), comments stripped, then
    // each <meta> tag parsed with the SAME atomic-quote tag regex and
    // whole-token attribute tokenization as
    // [[graft.ext.Curation.imageRefs]] — so a charset inside an HTML
    // comment or inside an unrelated attribute's quoted value (an
    // og:description mentioning one) can never be taken, exactly as
    // the spec's prescan skips comments and parses attributes. A
    // charset is accepted from a tag's own `charset` attribute, or
    // from its `content` attribute only when the tag's `http-equiv`
    // names content-type; the FIRST meta yielding one wins (document
    // order, the spec's rule).
    val prescan = regexp_replace(
      lower(decode(expr("substring(payload, 1, 1024)"), "ISO-8859-1")),
      "(?s)<!--.*?-->", "")
    val attrRe =
      "[a-z_:][a-z0-9_:.-]*\\s*=\\s*(?:\"[^\"]*\"|'[^']*'|[^\\s>\"']+)"
    def attrVal(tag: Column, name: String): Column = {
      val tok = try_element_at(
        filter(regexp_extract_all(tag, lit(attrRe), lit(0)),
          a => a.rlike(s"^$name\\s*=")), lit(1))
      coalesce(regexp_replace(
        regexp_replace(
          regexp_replace(tok, s"^$name\\s*=\\s*", ""),
          "^[\"']", ""),
        "[\"']$", ""), lit(""))
    }
    def tagCharset(tag: Column): Column = {
      val direct = regexp_extract(attrVal(tag, "charset"),
        "^([a-z0-9_\\-]+)", 1)
      val fromContent = regexp_extract(attrVal(tag, "content"),
        "charset\\s*=\\s*[\"']?([a-z0-9_\\-]+)", 1)
      when(direct =!= "", direct)
        .when(attrVal(tag, "http-equiv").contains("content-type") &&
          fromContent =!= "", fromContent)
        .otherwise(lit(""))
    }
    val metas = regexp_extract_all(prescan,
      lit("<meta\\b(?:[^>\"']|\"[^\"]*\"|'[^']*')*>"), lit(0))
    val metaCharset = coalesce(
      try_element_at(filter(transform(metas, t => tagCharset(t)),
        c => c =!= ""), lit(1)),
      lit(""))
    // header > meta (the transport layer outranks the document's own
    // declaration); the BOM outranks both below
    val charset =
      when(headerCharset =!= "", headerCharset).otherwise(metaCharset)
    records
      .where(col("warc_type") === "response" && col("http_status") === 200 &&
        col("http_content_type").startsWith("text/html") &&
        col("target_uri").isNotNull)
      .withColumn("__page",
        // BOM precedence first (WHATWG: BOM > HTTP header > meta tag):
        // a page shipping a byte-order mark decodes by it no matter
        // what anything declares, and the mark itself is stripped so
        // no U+FEFF leaks into the extracted text
        when(expr("substring(payload, 1, 3)") === lit(Utf8Bom),
          decode(expr("substring(payload, 4, 2147483647)"), "UTF-8"))
        .when(expr("substring(payload, 1, 2)") === lit(Utf16BeBom),
          decode(expr("substring(payload, 3, 2147483647)"), "UTF-16BE"))
        .when(expr("substring(payload, 1, 2)") === lit(Utf16LeBom),
          decode(expr("substring(payload, 3, 2147483647)"), "UTF-16LE"))
        .when(charset.isin(Cp1252Names: _*),
          // Spark's decode knows iso-8859-1 but not cp1252; the two
          // differ ONLY in 0x80–0x9F, which latin-1 maps to control
          // chars — translate them to the cp1252 glyphs afterwards
          translate(decode(col("payload"), "ISO-8859-1"),
            Cp1252High, Cp1252Glyphs))
        // UTF-8: the dominant and the fallback encoding
        .otherwise(decode(col("payload"), "UTF-8")))
  }

  /** The WET (extracted-text) composition — Common Crawl's
    * pre-extracted sibling of [[webDocuments]] and the most common
    * corpus input of public text pipelines: `conversion` records carry
    * the crawl's OWN text extraction as a UTF-8 `text/plain` payload,
    * so the documents shape needs no HTTP split and no html_text pass —
    * type filter, UTF-8 decode, stable URI-hash ids. The per-file
    * `warcinfo` preamble record filters out on type. Same streaming
    * parse, quarantine contract, and zero-shuffle projection shape as
    * [[webDocuments]] (WET segments are record-gzipped like WARC; the
    * default `readWarc` glob `*.warc*` matches `*.warc.wet.gz`). */
  def wetDocuments(records: DataFrame): DataFrame =
    records
      .where(col("warc_type") === "conversion" &&
        col("content_type").startsWith("text/plain") &&
        col("target_uri").isNotNull)
      .select(
        graft.ext.Text.hash60(col("target_uri")).as("doc_id"),
        col("target_uri").as("url"),
        col("warc_date").as("fetched"),
        decode(col("payload"), "UTF-8").as("text"))
}
