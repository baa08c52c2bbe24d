package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The r10 round-killer, pinned: the driver regenerated `events.parquet`
  * with `ts` as plain timestamp[us] (read by Spark as TIMESTAMP_NTZ) where
  * every prior generation used TIMESTAMP(NANOS) (read as a long under
  * nanosAsLong), and the hardcoded nanos workaround in Tables.events threw
  * DATATYPE_MISMATCH on all 42 events-derived queries. This spec writes
  * the SAME logical rows in all three encodings the generator has ever
  * produced and asserts [[Tables.events]] and the derived [[Tables.feed]]
  * are bit-identical across them, so the next silent regeneration in
  * either direction cannot take a round down. */
class EventsEncodingSpec extends SparkSpec {

  private def scratch(): String =
    Files.createTempDirectory("events-enc").toString

  /** Base rows: epoch micros chosen non-round so ms flooring is exercised. */
  private def base = {
    import spark.implicits._
    Seq(
      (1L, 1700000000123456L, 10L, "purchase", 5.0, """{"k":1}"""),
      (2L, 1700000001987654L, 11L, "click", 1.0, """{"k":2}"""),
      (3L, 1700000003000001L, 12L, "error", 0.0, """{"k":3}"""),
      (17L, 1700000004500999L, 13L, "view", 2.0, """{"k":4}"""))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
  }

  /** r≤9 encoding: int64 nanos (what nanosAsLong reads TIMESTAMP_NS as). */
  private def writeNanosLong(dir: String): Unit =
    base.withColumn("ts", col("ts_us") * 1000).drop("ts_us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

  /** r10 encoding: timestamp[us] isAdjustedToUTC=false → TIMESTAMP_NTZ. */
  private def writeNtz(dir: String): Unit =
    base.withColumn("ts", timestamp_micros(col("ts_us")).cast(TimestampNTZType))
      .drop("ts_us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

  /** UTC-adjusted instant encoding (TimestampType), for completeness. */
  private def writeTz(dir: String): Unit =
    base.withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

  test("Tables.events normalizes all three ts encodings to the same rows") {
    val dirs = Seq(writeNanosLong _, writeNtz _, writeTz _).map { w =>
      val d = scratch(); w(d); d
    }
    val frames = dirs.map(d => Tables.events(spark, d))
    // every branch lands on TimestampType — downstream unix_millis and
    // window functions analyze identically no matter the file encoding
    frames.foreach(f => assert(f.schema("ts").dataType === TimestampType))
    val collected = frames.map(_.orderBy("event_id")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .collect().toSeq)
    assert(collected(1) === collected(0), "NTZ encoding diverges from legacy nanos")
    assert(collected(2) === collected(0), "TZ encoding diverges from legacy nanos")
  }

  test("derived feed (block_time_ms) is identical across encodings") {
    val dirs = Seq(writeNanosLong _, writeNtz _).map { w =>
      val d = scratch(); w(d); d
    }
    val feeds = dirs.map(d => Tables.feed(spark, d)
      .orderBy("height", "seq_in_block").collect().toSeq)
    assert(feeds(1) === feeds(0),
      "feed derived from timestamp[us] events diverges from legacy nanos")
    // ms flooring matches DuckDB epoch_ms: 1700000000123456 µs → 1700000000123
    val ms = Tables.feed(spark, dirs(1))
      .where(col("seq_in_block") === 1 && col("height") === 0)
      .select("block_time_ms").head().getLong(0)
    assert(ms === 1700000000123L)
  }

  test("an unrecognized ts encoding fails loudly, not 42 times downstream") {
    val d = scratch()
    base.withColumn("ts", col("ts_us").cast("string")).drop("ts_us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, d))
    assert(e.getMessage.contains("testdata schema changed"))
  }
}
