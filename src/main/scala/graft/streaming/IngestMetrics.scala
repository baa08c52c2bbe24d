package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed ingestion metrics for a continuously-fed corpus —
  * the watermark + tumbling-window shape of Structured Streaming applied
  * to data-quality accounting: how many documents arrived per window,
  * how many passed the quality gate, and the aggregate size. (The
  * blockchain feed itself never needs event-time windows — finalized
  * blocks cannot be late, SURVEY §2 — but a crawled TEXT feed does:
  * documents arrive out of order and stragglers must not hold state
  * forever.)
  *
  * Append-mode output: a window's row is emitted once, when the
  * watermark passes its end — the state store holds only open windows,
  * bounded by `delay`. Pair with [[graft.ext.Dedup.streamingExact]]
  * upstream for the full streaming curation front end.
  */
object IngestMetrics {

  /** Per-window document counts and quality accounting.
    *
    * @param docs      streaming frame with an event-time column and a
    *                  text column
    * @param eventTime event-time column (TimestampType)
    * @param text      document text column
    * @param window    tumbling window width, e.g. "1 minute"
    * @param delay     watermark delay bounding state and lateness
    */
  def docsPerWindow(docs: DataFrame, eventTime: Column, text: Column,
                    window: String, delay: String): DataFrame =
    docs
      .select(eventTime.as("event_time"), text.as("text"))
      .withWatermark("event_time", delay)
      .groupBy(org.apache.spark.sql.functions.window(col("event_time"), window))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("sum_chars"),
        sum(when(length(col("text")) >= 20, 1L).otherwise(0L))
          .as("n_len_ok"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("n_docs"), col("sum_chars"), col("n_len_ok"))
}
