package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming forms of the event-time operators (SURVEY §2.9
  * — the true-streaming generalization of the reference's hand-rolled
  * watermark incrementality at elastic.go:50-58 / cmd/etl/etl.go:19).
  *
  * Each transform takes a *streaming* DataFrame with an event-time
  * column `ts` and returns a streaming DataFrame; checkpointing and
  * offsets come from Structured Streaming itself — the part the
  * reference hand-rolled with sorted scans + progress-log watermarks.
  *
  * Output columns match the batch twins in
  * [[graft.operators.EventOps]], so a caller can swap batch/streaming
  * execution per source without touching downstream code.
  *
  * Scale: state is bounded by the watermark — expired windows are
  * evicted from the store; no unbounded maps (the reference's
  * `uMap`/`rMap` grow forever, cmd/bulk/main.go:29-53).
  */
object EventStreams {

  private def sumE4 = sum(floor(col("value") * 10000 + 0.5).cast("long")).as("sum_value_e4")

  /** Tumbling event-time windows with late-data eviction. */
  def tumbling(events: DataFrame, delay: String, size: String): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), size), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sumE4)
      .select(
        unix_millis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("n_events"), col("sum_value_e4"))

  /** Sliding event-time windows. */
  def sliding(events: DataFrame, delay: String, size: String, slide: String): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), size, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sumE4)
      .select(
        unix_millis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("n_events"), col("sum_value_e4"))

  /** Session windows per user (gap-merged by the state store).
    * `last_event_ms` is the max event time, NOT `session_window.end`
    * (which is last event + gap) — matching the batch twin exactly.
    */
  def sessions(events: DataFrame, delay: String, gap: String): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        max(unix_millis(col("ts"))).as("last_event_ms"),
        count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_millis(col("session_window.start")).as("session_start_ms"),
        col("last_event_ms"),
        col("n_events"))

  /** Streaming exact dedup on event id, state bounded by the watermark
    * (the reference's uMap as a managed, evictable store).
    */
  def dedup(events: DataFrame, delay: String): DataFrame =
    events.withWatermark("ts", delay).dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each left event pairs with right
    * events of the same user within `[l.ts, l.ts + horizon]`. Both
    * sides carry watermarks, so the join state (buffered unmatched
    * rows) is evicted once the interval can no longer match — the
    * bounded-state form of "attribute purchases to the click that
    * preceded them".
    *
    * `joinType = "left_outer"` emits unconverted left events with null
    * right columns — but only once the watermark proves no match can
    * still arrive (the row leaves the state store at eviction time, so
    * outer results trail the inner ones by the watermark delay; that
    * lag is the price of exactly-once null-match semantics).
    */
  def attributionJoin(
      left: DataFrame,
      right: DataFrame,
      delay: String,
      horizonSeconds: Long,
      joinType: String = "inner"): DataFrame = {
    val l = left.select(
      col("event_id").as("l_event_id"), col("user_id"),
      col("ts").as("l_ts")).withWatermark("l_ts", delay)
    val r = right.select(
      col("event_id").as("r_event_id"), col("user_id").as("r_user_id"),
      col("ts").as("r_ts"),
      floor(col("value") * 10000 + 0.5).cast("long").as("r_value_e4"))
      .withWatermark("r_ts", delay)
    l.join(r,
      col("user_id") === col("r_user_id") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $horizonSeconds SECONDS"),
      joinType)
      .select(
        col("l_event_id"), col("user_id"),
        unix_millis(col("l_ts")).as("l_ts_ms"),
        col("r_event_id"),
        unix_millis(col("r_ts")).as("r_ts_ms"),
        col("r_value_e4"))
  }
}
