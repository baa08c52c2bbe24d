package graft.ext

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming exact dedup emits first-seen content only, within watermark") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val feed = input.toDF().toDF("doc_id", "ms", "text")
      .withColumn("event_time", timestamp_millis(col("ms")))
    val deduped = Dedup.streamingExact(feed, col("text"), col("doc_id"),
      col("event_time"), "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      input.addData((1L, 1000L, "alpha"))
      q.processAllAvailable()
      // a later duplicate of "alpha" is suppressed; new content passes
      input.addData((2L, 2000L, "alpha"), (3L, 3000L, "beta"))
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id FROM sdedup").as[Long].collect().sorted
      assert(got.toSeq == Seq(1L, 3L))
    } finally q.stop()
  }

  test("two-tier incremental dedup: history bloom tags a live stream") {
    implicit val sq = spark.sqlContext

    // Tier 0 (batch, once): bloom over the accumulated corpus.
    val history = Seq((1L, "seen before"), (2L, "also known")).toDF("doc_id", "text")
    val bloom = Dedup.historyFilter(history, col("text"), expectedItems = 1000)

    // Tier 1 (stream): stateless tag — no false negatives by
    // construction, false positives settled later by the batch
    // newAgainst authority.
    val input = MemoryStream[(Long, String)]
    val tagged = Dedup.tagAgainstHistory(
      input.toDF().toDF("doc_id", "text"), col("text"), bloom)
    val q = tagged.writeStream.format("memory").queryName("stag")
      .outputMode("append").start()
    try {
      input.addData((10L, "seen before"), (11L, "genuinely new"),
        (12L, "also known"), (13L, "another new one"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, maybe_in_history FROM stag")
        .as[(Long, Boolean)].collect().toMap
      // every true history dup MUST be tagged (no false negatives)
      assert(rows(10L) && rows(12L))
      // the novel docs pass untagged here (fpp makes this probabilistic
      // in general; at 1000 expected items / 2 inserted it is certain
      // enough for fixed test data)
      assert(!rows(11L) && !rows(13L))
    } finally q.stop()
  }
}
