package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.{BlockFeed, BlockIngest}

/** Readers for the driver testdata tables and the derived reference-schema
  * tables (SURVEY §1.2) over them. All lazy DataFrame plans — Catalyst
  * prunes columns/pushes filters into the parquet scans of whatever query
  * is built on top. */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")
  /** `events.parquet`'s `ts` encoding has CHANGED between driver testdata
    * generations — TIMESTAMP(NANOS) (read by Spark as a long under
    * nanosAsLong) in rounds ≤9, plain timestamp[us] `isAdjustedToUTC=false`
    * (read as TIMESTAMP_NTZ) from round 10 — so branch on the dtype the
    * scan actually reports instead of assuming either. Every branch
    * normalizes to TimestampType at microsecond precision: with the
    * session time zone pinned UTC (Verify/Bench/specs all do), the NTZ →
    * TZ cast is a bitwise no-op on the stored micros, and downstream
    * `unix_millis` matches DuckDB's `epoch_ms` on the same naive values. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType    => raw
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"testdata schema changed: events.ts is $other, expected " +
          "long (legacy nanos), timestamp, or timestamp_ntz")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  /** The block feed (with deterministic summary ids) derived from the
    * `events` stand-in stream. */
  def feed(s: SparkSession, d: String): DataFrame =
    BlockIngest.withId(BlockFeed.fromEvents(events(s, d)))

  def summaries(s: SparkSession, d: String): DataFrame =
    BlockIngest.summaries(feed(s, d))

  /** `summaries` plus the sender column (derivable from the JSON envelope
    * in the reference, `sender_account()`, postgres.rs:51-62 — here kept
    * from the feed, saving a JSON parse). */
  def summariesWithSender(s: SparkSession, d: String): DataFrame =
    BlockIngest.summariesWithSender(feed(s, d))

  def ati(s: SparkSession, d: String): DataFrame = BlockIngest.ati(feed(s, d))
  def cti(s: SparkSession, d: String): DataFrame = BlockIngest.cti(feed(s, d))
  def cis2Tokens(s: SparkSession, d: String): DataFrame = BlockIngest.cis2Tokens(feed(s, d))
  def keyBindings(s: SparkSession, d: String): DataFrame = BlockIngest.keyBindings(feed(s, d))
}
