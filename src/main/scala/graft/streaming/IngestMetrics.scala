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

  /** STREAMING sessionization — the `session_window` counterpart of the
    * batch gap-based `q_sessionize` (RelationalQueries): per-key
    * activity sessions that close when no event arrives within `gap`.
    * Unlike the tumbling [[docsPerWindow]], session windows MERGE in
    * the state store as events arrive (two open sessions bridged by a
    * late event collapse into one); the watermark bounds both lateness
    * and state — a session is emitted (append mode) once the watermark
    * passes its end, and its state row is dropped.
    *
    * Semantics note vs the batch variant: Spark defines a session's end
    * as last-event-time + gap, so `duration_ms` here includes the
    * trailing gap, where the batch lag/cumsum formulation measures
    * first-to-last event span. Both are deterministic; pick per use.
    *
    * Scale: state is hash-distributed by the grouping key, so a hot key
    * concentrates its (single-row, merged) session state on one
    * partition — bounded by sessions-per-key, not events-per-key,
    * which is what makes this safe where a per-key event sort would
    * not be. */
  def userSessions(docs: DataFrame, eventTime: Column, key: Column,
                   gap: String, delay: String): DataFrame =
    docs
      .select(eventTime.as("event_time"), key.as("user_id"))
      .withWatermark("event_time", delay)
      .groupBy(session_window(col("event_time"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        (unix_millis(col("session_window.end")) -
          unix_millis(col("session_window.start"))).as("duration_ms"),
        col("n_events"))
}
