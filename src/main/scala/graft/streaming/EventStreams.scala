package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Buffered event awaiting watermark finalization (streaming
  * transitions state). Microsecond timestamps: the batch twin orders
  * by the full-precision `ts` column, so a millisecond-truncated
  * buffer would order same-ms events differently. Top-level: Spark
  * encoders cannot resolve spec/object-nested case classes from
  * executor deserializers.
  */
final case class BufferedEv(tsUs: Long, eventId: Long, eventType: String)

/** Per-user transitions state: the last finalized event type + the
  * not-yet-finalized buffer.
  */
final case class TransState(lastType: Option[String], buf: List[BufferedEv])

/** One emitted transition instance (aggregate downstream for counts). */
final case class TransitionRow(
    user_id: String, from_type: String, to_type: String, at_us: Long)

/** Per-user funnel state: how many steps are complete, when the last
  * one completed (µs), and the not-yet-finalized buffer.
  */
final case class FunnelState(stepIdx: Int, reachedMs: Long, buf: List[BufferedEv])

/** One funnel advancement: user reached `step` (1-based) at `t_ms`.
  * `groupBy(step).count` over this stream is the batch funnel's
  * per-step user count.
  */
final case class FunnelRow(user_id: String, step: Long, event_type: String, t_ms: Long)

/** Buffered value awaiting watermark finalization (streaming rolling
  * anomaly state): µs timestamp + tie-break id + cent-quantized value.
  */
final case class BufferedVal(tsUs: Long, eventId: Long, vE2: Long)

/** Per-user rolling-anomaly state: the trailing ring of the last
  * `lookback` FINALIZED values (oldest first) + the not-yet-finalized
  * buffer. Ring is O(lookback) by construction.
  */
final case class AnomState(ring: List[Long], buf: List[BufferedVal])

/** One flagged anomaly — columns match the batch
  * [[graft.operators.EventOps.rollingAnomaly]] output.
  */
final case class AnomalyRow(
    event_id: Long, user_id: String, t: Long, v_e2: Long, n_prev: Long)

/** Per-key CDC state: the last applied change's payload and position. */
final case class CdcState(valueE4: Long, tsMs: Long, seq: Long, deleted: Boolean)

/** One emitted current-state row; `deleted = true` is a retraction
  * (the key's tombstone reached the head of its history).
  */
final case class CdcRow(key: String, value_e4: Long, updated_ms: Long, deleted: Boolean)

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

  /** Streaming form of [[graft.operators.EventOps.transitions]]:
    * per-user adjacent event pairs in event-time order, emitted
    * exactly once. The hard part a batch window gets for free is
    * ORDER under out-of-order arrival — solved here by buffering
    * events in the state store and finalizing only those older than
    * the watermark (nothing that could still precede them can
    * arrive); `event_id` breaks timestamp ties, matching the batch
    * twin. An event-time timeout drains each user's buffer as the
    * watermark advances even if that user never speaks again.
    *
    * State per user = last finalized type + the in-flight buffer,
    * bounded by the watermark delay × per-user event rate. Late
    * events (below the watermark at arrival) are dropped — the same
    * rows a `withWatermark` aggregation would discard.
    */
  def transitions(events: DataFrame, delay: String): Dataset[TransitionRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", delay)
      .select(
        col("user_id").cast("string").as("_1"),
        col("event_type").as("_2"),
        unix_micros(col("ts")).as("_3"),
        col("event_id").as("_4"),
        // the watermarked attribute itself must reach the stateful
        // operator (the unsupported-op checker verifies it), even
        // though the lambda reads the micros projection
        col("ts").as("_5"))
      .as[(String, String, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[TransState, TransitionRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[TransState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val st = state.getOption.getOrElse(TransState(None, Nil))
          // admit on-time arrivals; drop sub-watermark stragglers
          val incoming = rows.map(r => BufferedEv(r._3, r._4, r._2))
            .filter(_.tsUs >= wmUs).toList
          val (ready, pending) = (st.buf ++ incoming).partition(_.tsUs < wmUs)
          val ordered = ready.sortBy(e => (e.tsUs, e.eventId))
          val emitted = List.newBuilder[TransitionRow]
          var last = st.lastType
          for (e <- ordered) {
            last.foreach(f => emitted += TransitionRow(uid, f, e.eventType, e.tsUs))
            last = Some(e.eventType)
          }
          state.update(TransState(last, pending))
          // wake this user when the watermark passes its oldest
          // buffered event, so buffers drain without new arrivals
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(pending.map(_.tsUs).min / 1000L + 1)
          emitted.result().iterator
      }
  }

  /** Streaming conversion funnel — the stateful twin of
    * [[graft.operators.EventOps.funnel]]: per user, events are
    * finalized in `(ts, event_id)` order behind the watermark (same
    * buffer discipline as [[transitions]]), and an ordered scan
    * advances the user through `steps` — an event advances iff its
    * type is the NEXT step and it is strictly later than the previous
    * advancement (first step unconstrained). That scan picks exactly
    * the batch form's `min t > prev_t` event per step, so the emitted
    * `(user, step)` rows aggregate to the batch counts (spec-pinned on
    * a fixture replay).
    *
    * State is O(1) per user beyond the watermark buffer: step index +
    * one timestamp. Emission is append-mode per advancement; count
    * per step downstream (a streaming global aggregate would force
    * update mode on the whole query).
    *
    * `maxGapMs` makes this the twin of
    * [[graft.operators.EventOps.funnelWindowed]]: an advancement must
    * land within the gap of the previous one (deadline inclusive).
    */
  def funnel(events: DataFrame, delay: String, steps: Seq[String],
      maxGapMs: Option[Long] = None): Dataset[FunnelRow] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxGapMs.forall(_ > 0), "maxGapMs must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", delay)
      .select(
        col("user_id").cast("string").as("_1"),
        col("event_type").as("_2"),
        unix_micros(col("ts")).as("_3"),
        col("event_id").as("_4"),
        col("ts").as("_5"))
      .as[(String, String, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[FunnelState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val st = state.getOption.getOrElse(FunnelState(0, Long.MinValue, Nil))
          val incoming = rows.map(r => BufferedEv(r._3, r._4, r._2))
            .filter(_.tsUs >= wmUs).toList
          val (ready, pending) = (st.buf ++ incoming).partition(_.tsUs < wmUs)
          val ordered = ready.sortBy(e => (e.tsUs, e.eventId))
          var idx = st.stepIdx
          var reached = st.reachedMs
          val emitted = List.newBuilder[FunnelRow]
          for (e <- ordered if idx < steps.length) {
            // advance at MILLISECOND granularity — the batch twin
            // compares unix_millis, so a step event in the same ms as
            // the previous advancement must not advance here either.
            // (Scanning in micro order still picks the min-ms event:
            // ms order is a coarsening of micro order.)
            // the optional per-step deadline (EventOps.funnelWindowed's
            // gap) composes with the strictly-after rule: once the
            // deadline passes, no later event can qualify either, so
            // skipping here IS the batch min-over-window semantics
            if (e.eventType == steps(idx) && (idx == 0 ||
                (e.tsUs / 1000L > reached &&
                  maxGapMs.forall(g => e.tsUs / 1000L <= reached + g)))) {
              reached = e.tsUs / 1000L
              idx += 1
              emitted += FunnelRow(uid, idx.toLong, e.eventType, e.tsUs / 1000L)
            }
          }
          state.update(FunnelState(idx, reached, pending))
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(pending.map(_.tsUs).min / 1000L + 1)
          emitted.result().iterator
      }
  }

  /** Streaming rolling anomaly detector — the stateful twin of
    * [[graft.operators.EventOps.rollingAnomaly]]: per user, events are
    * finalized in `(ts, event_id)` order behind the watermark (the
    * [[transitions]] buffer discipline), and each finalized value is
    * tested against the trailing ring of the `lookback` previously
    * finalized values with the same exact-integer z² inequality
    * `(x·n − s)² > k²(n·q − s²)` — no doubles, no division. The ring
    * then advances, so every event is scored strictly out-of-sample,
    * exactly like the batch window's `rowsBetween(-lookback, -1)`.
    *
    * State per user = the O(lookback) ring + the watermark buffer —
    * this is the `flatMapGroupsWithState` ring buffer the batch form's
    * scaladoc promises; emission is append-mode flagged rows only, so
    * the stream is as sparse as the anomalies. Late events (below the
    * watermark) are dropped, same as every stateful op here.
    */
  def rollingAnomaly(events: DataFrame, delay: String, lookback: Int = 8,
      minPrev: Int = 4, k: Int = 3): Dataset[AnomalyRow] = {
    require(lookback >= 1 && minPrev >= 1 && k >= 1,
      s"lookback/minPrev/k must be >= 1, got $lookback/$minPrev/$k")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", delay)
      .select(
        col("user_id").cast("string").as("_1"),
        unix_micros(col("ts")).as("_2"),
        col("event_id").as("_3"),
        floor(col("value") * 100 + 0.5).cast("long").as("_4"),
        col("ts").as("_5"))
      .as[(String, Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AnomState, AnomalyRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[AnomState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val st = state.getOption.getOrElse(AnomState(Nil, Nil))
          val incoming = rows.map(r => BufferedVal(r._2, r._3, r._4))
            .filter(_.tsUs >= wmUs).toList
          val (ready, pending) = (st.buf ++ incoming).partition(_.tsUs < wmUs)
          val ordered = ready.sortBy(e => (e.tsUs, e.eventId))
          val emitted = List.newBuilder[AnomalyRow]
          var ring = st.ring
          for (e <- ordered) {
            val n = ring.size.toLong
            if (n >= minPrev) {
              val s = ring.sum
              val q = ring.map(x => x * x).sum
              val lhs = e.vE2 * n - s
              if (lhs * lhs > k.toLong * k * (n * q - s * s))
                emitted += AnomalyRow(e.eventId, uid, e.tsUs / 1000L, e.vE2, n)
            }
            ring = (ring :+ e.vE2).takeRight(lookback)
          }
          state.update(AnomState(ring, pending))
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(pending.map(_.tsUs).min / 1000L + 1)
          emitted.result().iterator
      }
  }

  /** Continuous CDC apply — the streaming twin of
    * [[graft.operators.EventOps.applyChangelog]]: a changelog stream
    * of upserts (`op = "U"`) and delete tombstones (`op = "D"`) folds
    * into per-key state with last-wins-by-`(ts_ms, seq)` semantics;
    * each batch emits the key's CURRENT row when (and only when) the
    * batch changed it (update mode; `deleted = true` rows are
    * retractions a sink applies as deletes). Out-of-order and replayed
    * changes are absorbed: a change at or below the state's applied
    * `(ts_ms, seq)` position is a no-op, so the emitted end-state
    * always equals the batch operator over the same changelog.
    * State is O(1) per key (payload + position, no history).
    */
  def cdcApply(changes: DataFrame): Dataset[CdcRow] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .select(col("key").as("_1"), col("op").as("_2"),
        col("value_e4").as("_3"), col("ts_ms").as("_4"), col("seq").as("_5"))
      .as[(String, String, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CdcState, CdcRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[CdcState]) =>
          val newest = rows.maxBy(r => (r._4, r._5))
          val ahead = state.getOption.forall(s =>
            newest._4 > s.tsMs || (newest._4 == s.tsMs && newest._5 > s.seq))
          if (!ahead) Iterator.empty
          else {
            val ns = CdcState(newest._3, newest._4, newest._5, newest._2 == "D")
            state.update(ns)
            Iterator(CdcRow(key,
              if (ns.deleted) 0L else ns.valueE4, ns.tsMs, ns.deleted))
          }
      }
  }

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
