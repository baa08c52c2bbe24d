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

  test("session windows merge across a gap-bridging event and close by watermark") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String)] // (ms, user)
    val feed = input.toDF().toDF("ms", "user")
      .withColumn("event_time", timestamp_millis(col("ms")))
    val sessions = IngestMetrics.userSessions(feed,
      col("event_time"), col("user"), gap = "30 seconds", delay = "60 seconds")
    val q = sessions.writeStream.format("memory").queryName("user_sessions")
      .outputMode("append").start()
    try {
      // user a: events at 0s and 50s — 50s gap > 30s, so TWO open
      // sessions; user b: one event at 5s
      input.addData((0L, "a"), (50000L, "a"), (5000L, "b"))
      q.processAllAvailable()
      // the bridge: an event at 25s is within 30s of BOTH of a's open
      // sessions — the state store must MERGE them into one [0s, 80s).
      // (the 60s watermark delay keeps 25s above the watermark — 50s
      // max event minus 60s — so the bridge is late-but-in-bounds,
      // exactly the case session merging exists for)
      input.addData((25000L, "a"))
      q.processAllAvailable()
      // advance the watermark far past every session's end
      input.addData((500000L, "c"))
      q.processAllAvailable()
      val rows = spark.sql(
        """SELECT user_id, session_start, session_end, duration_ms, n_events
          |FROM user_sessions ORDER BY user_id""".stripMargin).collect()
      assert(rows.length == 2) // a's merged session + b's; c's is still open
      val a = rows(0)
      assert(a.getString(0) == "a")
      assert(a.getAs[Timestamp]("session_start").getTime == 0L)
      // end = last event (50s) + gap (30s)
      assert(a.getAs[Timestamp]("session_end").getTime == 80000L)
      assert(a.getAs[Long]("duration_ms") == 80000L)
      assert(a.getAs[Long]("n_events") == 3L)
      val b = rows(1)
      assert(b.getString(0) == "b")
      assert(b.getAs[Long]("n_events") == 1L)
      assert(b.getAs[Timestamp]("session_end").getTime == 35000L)
    } finally q.stop()
  }
}
