package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class IngestMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("windowed doc metrics emit closed windows once the watermark passes") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String)] // (ms, text)
    val feed = input.toDF().toDF("ms", "text")
      .withColumn("event_time", timestamp_millis(col("ms")))
    val metrics = IngestMetrics.docsPerWindow(feed,
      col("event_time"), col("text"), "1 minute", "30 seconds")
    val q = metrics.writeStream.format("memory").queryName("ingest_metrics")
      .outputMode("append").start()
    try {
      // window [0, 60s): three docs, one under the length gate
      input.addData(
        (1000L, "a long enough document body here"),
        (2000L, "short"),
        (59000L, "another sufficiently long document"))
      q.processAllAvailable()
      // advance the watermark far past the first window's end
      input.addData((200000L, "late-window document, long enough too"))
      q.processAllAvailable()
      val rows = spark.sql(
        """SELECT window_start, n_docs, sum_chars, n_len_ok
          |FROM ingest_metrics ORDER BY window_start""".stripMargin)
        .collect()
      // only the CLOSED first window is emitted in append mode
      assert(rows.length == 1)
      assert(rows(0).getAs[Timestamp]("window_start").getTime == 0L)
      assert(rows(0).getAs[Long]("n_docs") == 3L)
      assert(rows(0).getAs[Long]("n_len_ok") == 2L)
      assert(rows(0).getAs[Long]("sum_chars") ==
        ("a long enough document body here".length +
          "short".length + "another sufficiently long document".length).toLong)
    } finally q.stop()
  }
}
