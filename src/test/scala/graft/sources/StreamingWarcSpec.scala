package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Continuous crawl ingestion: WARC segment files appearing in a
  * directory are a file STREAM (binaryFile source), and the whole
  * parse → webDocuments composition is stateless narrow transforms, so
  * it runs unchanged under Structured Streaming — new segments become
  * new documents exactly once, driven by the file-source checkpoint. */
class StreamingWarcSpec extends SparkSpec {
  import spark.implicits._

  private val CRLF = "\r\n"

  private def rec(uri: String, body: String): Array[Byte] = {
    val http = (s"HTTP/1.1 200 OK${CRLF}Content-Type: text/html; " +
      s"charset=utf-8$CRLF$CRLF").getBytes("ISO-8859-1") ++ body.getBytes("UTF-8")
    val hdrs = Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> s"<urn:uuid:${uri.hashCode}>",
      "WARC-Date" -> "2026-03-04T05:06:07Z",
      "WARC-Target-URI" -> uri,
      "Content-Type" -> "application/http; msgtype=response",
      "Content-Length" -> http.length.toString)
    (("WARC/1.0" +: hdrs.map { case (k, v) => s"$k: $v" }).mkString(CRLF) +
      CRLF + CRLF).getBytes("ISO-8859-1") ++ http ++
      (CRLF + CRLF).getBytes("ISO-8859-1")
  }

  test("segments appearing in a directory stream into documents") {
    val dir = Files.createTempDirectory("graft-warc-stream")
    Files.write(dir.resolve("seg-0.warc"),
      rec("http://s.example/one", "<p>first page</p>"))

    val stream = spark.readStream.format("binaryFile")
      .schema(spark.read.format("binaryFile").load(dir.toString).schema)
      .option("pathGlobFilter", "*.warc*")
      .load(dir.toString)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) => WarcCorpus.parseRecords(p, bytes) }
      .toDF()
    val docs = WarcCorpus.webDocuments(stream)
    val q = docs.writeStream.format("memory").queryName("swarc")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT url, text FROM swarc").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet ==
        Set("http://s.example/one" -> "first page"))
      // a NEW segment lands in the directory mid-stream
      Files.write(dir.resolve("seg-1.warc"),
        rec("http://s.example/two", "<p>second page</p>"))
      q.processAllAvailable()
      assert(spark.sql("SELECT url FROM swarc").count() == 2)
      // exactly once: an already-processed file is not re-read
      q.processAllAvailable()
      assert(spark.sql("SELECT url FROM swarc").count() == 2)
    } finally q.stop()
  }
}
