package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation and streaming dedup over the `events`
  * stream — the Structured Streaming form of the batch queries Q15/Q16 and
  * the streaming analog of the reference's 5 s micro-window buffering (S6)
  * and post-hoc time-series aggregation (A3).
  *
  * Scale notes: watermark + tumbling window is the canonical bounded-state
  * shape — state per (window, event_type) only, late rows beyond the
  * watermark dropped, so executor state does not grow with stream length.
  * Streaming dedup keys state by user id and likewise ages it out with the
  * watermark.
  */
object EventWindows {

  /** Tumbling event-time window with watermark; append mode emits a window
    * only after the watermark passes its end. */
  def windowedCounts(events: DataFrame, windowLength: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value")).as("sv"))
      .select(col("window.start").as("w"), col("event_type"),
        col("cnt"), col("sv"))

  /** Streaming exact dedup on (event_type, user_id) with watermark-bounded
    * state — the streaming analog of Q16's exact distinct count. */
  def dedupUsers(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_type", "user_id")
      .select(col("event_type"), col("user_id"), col("ts"))

  /** Windowed approximate distinct users per event type — the KMV sketch
    * ([[graft.functions.KmvSketch]]) inside an event-time window. The
    * sketch's merge is what makes this work: partial buffers combine
    * across micro-batches and tasks, so state per (window, event_type) is
    * one k-long buffer instead of a distinct-user set — the bounded-state
    * answer when per-window cardinalities are too large for exact
    * `dropDuplicates` state. Estimates are identical to the batch a02
    * aggregate over the same rows (order-independent by construction). */
  def windowedDistinctUsers(events: DataFrame,
      windowLength: String = "1 hour", watermark: String = "10 minutes",
      k: Int = 64): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(graft.functions.KmvSketch.column(
        graft.functions.TextFunctions.fingerprint(
          col("user_id").cast("string")), k).as("approx_users"))
      .select(col("window.start").as("w"), col("event_type"),
        col("approx_users"))

  /** Streaming sessionization — the streaming form of batch query Q21:
    * `session_window` keeps ONE open (merging) session per user in state,
    * closes it when the watermark passes its end + gap, and emits exactly
    * once (append mode). State is O(active users), not O(events). */
  def sessions(events: DataFrame, gap: String = "12 hours",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("last_ts"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("n_events"), col("last_ts"))
}
