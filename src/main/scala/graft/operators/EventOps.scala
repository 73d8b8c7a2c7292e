package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-time windowed aggregation over the `events` table — the
  * true-streaming generalization of the reference's hand-rolled
  * watermark incrementality (SURVEY §2.9 T1/T3). These are the *batch*
  * forms; `graft.streaming.EventStreams` wires the same logic through
  * Structured Streaming (`withWatermark` + `window`/`session_window`).
  *
  * Time discipline: all outputs are epoch milliseconds (BIGINT) —
  * timestamps never cross the engine boundary as physical timestamp
  * types, which sidesteps ns/µs parquet annotation mismatches.
  */
object EventOps {

  private def sumE4(c: Column): Column =
    sum(floor(c * 10000 + 0.5).cast("long")).as("sum_value_e4")

  /** Tumbling event-time windows of `sizeMs`. */
  def tumbling(events: DataFrame, sizeMs: Long): DataFrame =
    events
      .groupBy(
        (floor(unix_millis(col("ts")) / sizeMs) * sizeMs).as("window_start_ms"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), sumE4(col("value")))

  /** Sliding windows: `sizeMs` wide, advancing every `slideMs`
    * (`sizeMs % slideMs == 0`). Each event explodes into
    * `sizeMs/slideMs` window rows — the same expansion
    * `window(ts, size, slide)` performs internally.
    */
  def sliding(events: DataFrame, sizeMs: Long, slideMs: Long): DataFrame = {
    require(sizeMs % slideMs == 0, "sizeMs must be a multiple of slideMs")
    val k = (sizeMs / slideMs).toInt
    events
      .withColumn("t", unix_millis(col("ts")))
      .withColumn("w0", floor(col("t") / slideMs) * slideMs)
      .select(
        col("event_type"), col("value"),
        explode(sequence(lit(0), lit(k - 1)))
          .as("off"), col("w0"))
      .select(
        (col("w0") - col("off") * slideMs).as("window_start_ms"),
        col("event_type"), col("value"))
      .groupBy(col("window_start_ms"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sumE4(col("value")))
  }

  /** Session windows per user with inactivity gap `gapMs`: an event
    * extends the session iff it starts < `gapMs` after the previous
    * event (identical to `session_window`'s merge rule). Implemented
    * with lag + running sum — one shuffle on `user_id`, no state store.
    */
  def sessions(events: DataFrame, gapMs: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("t"))
    events
      .select(col("user_id"), unix_millis(col("ts")).as("t"))
      .withColumn("prev_t", lag(col("t"), 1).over(byUser))
      .withColumn("new_s",
        when(col("prev_t").isNull || col("t") - col("prev_t") >= gapMs, 1L).otherwise(0L))
      .withColumn("session_no", sum(col("new_s")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(
        min(col("t")).as("session_start_ms"),
        max(col("t")).as("last_event_ms"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start_ms"), col("last_event_ms"), col("n_events"))
  }

  /** Dedup-keep-latest per key (the reference's T3 stateful dedup,
    * batch form): latest event per (user_id, event_type), ties broken
    * by highest event_id.
    */
  def latestPerKey(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("user_id"), col("event_type"), col("event_id"),
        unix_millis(col("ts")).as("ts_ms"))
  }
}
