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
}
