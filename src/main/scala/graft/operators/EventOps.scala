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

  /** Ordered conversion funnel with first-touch semantics: step k
    * counts a user iff an event of `steps(k)` occurs strictly after
    * the user's step-(k−1) reach time, where the reach time is the
    * EARLIEST qualifying event (so later steps are measured against
    * the first conversion, not any conversion — the standard product-
    * analytics definition). Returns one row per step:
    * `(step, event_type, n_users)`.
    *
    * Scale shape: one narrow type-filter + user-keyed min-agg per
    * step, chained by an equi-join on `user_id`. The reached set only
    * shrinks down the funnel, so every join after step 1 is
    * candidate-sized, not corpus-sized; nothing is collected to the
    * driver and each stage's shuffle carries (user_id, t) pairs only.
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = events.select(
      col("user_id"), col("event_type"), unix_millis(col("ts")).as("t"))
    var reached = e.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("t")).as("t"))
    var out = reached.agg(count(lit(1)).as("n_users"))
      .select(lit(1L).as("step"), lit(steps.head).as("event_type"), col("n_users"))
    for ((st, i) <- steps.zipWithIndex.drop(1)) {
      val prev = reached.select(col("user_id"), col("t").as("prev_t"))
      reached = e.filter(col("event_type") === st)
        .join(prev, "user_id")
        .filter(col("t") > col("prev_t"))
        .groupBy(col("user_id")).agg(min(col("t")).as("t"))
      out = out.unionByName(reached.agg(count(lit(1)).as("n_users"))
        .select(lit((i + 1).toLong).as("step"), lit(st).as("event_type"), col("n_users")))
    }
    out
  }

  /** Event-to-event transition counts (the first-order Markov profile
    * of user behavior): per user, events ordered by `(ts, event_id)`
    * — event_id breaks timestamp ties deterministically — and each
    * adjacent pair contributes one `(from_type, to_type)` count.
    * One shuffle on `user_id` for the window, then an 8-byte-ish
    * keyed count aggregate; event text/props never shuffle.
    */
  def transitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Cohort retention: users grouped by their first-activity period
    * (`cohort_p` = `floor(epoch_ms / periodMs)` — daily by default;
    * pure integer arithmetic both engines compute identically, no
    * calendar semantics to disagree on), counted per period offset
    * from that cohort. The `period_offset = 0` row is the cohort size.
    *
    * Scale shape: distinct (user, period) — the only corpus-sized
    * shuffle, and it collapses each user's events to at most
    * #periods rows — then a user-keyed min and a cohort-keyed count.
    */
  def retention(events: DataFrame, periodMs: Long = 86400000L): DataFrame = {
    val act = events
      .select(col("user_id"), unix_millis(col("ts")).as("t"))
      // integer div, not `/`: keeps the period index exact Long math
      .select(col("user_id"), expr(s"t div ${periodMs}L").as("p"))
      .distinct()
    val first = act.groupBy(col("user_id")).agg(min(col("p")).as("cohort_p"))
    act.join(first, "user_id")
      .groupBy(col("cohort_p"), (col("p") - col("cohort_p")).as("period_offset"))
      // act is distinct per (user, period), so count(*) counts users
      .agg(count(lit(1)).as("n_users"))
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

  /** Delete-aware CDC merge — the lakehouse `MERGE WHEN MATCHED`
    * dataflow, generalizing [[GraphOps.mergeEdgeStates]]' upsert-only
    * join with tombstones: apply a changelog of upserts (`op = "U"`)
    * and deletes (`op = "D"`) to a keyed state snapshot. Per key the
    * LATEST change wins — ordered by `(ts_ms, seq)`, `seq` breaking
    * same-timestamp ties (the changelog's own sequence number, e.g.
    * the event id) — then: latest `D` removes the key, latest `U`
    * upserts `(value_e4, ts_ms)`, keys without changes keep their
    * state row, unmatched `U` keys insert. Deterministic and
    * replay-idempotent (applying the same changelog twice is a
    * no-op — last-wins is absorbing).
    *
    * `state`: `(key, value_e4, updated_ms)`; `changes`:
    * `(key, op, value_e4, ts_ms, seq)`. One key window over the
    * changelog + one full-outer join on the key — the changelog is
    * batch-sized, state-sized work only on the join.
    */
  def applyChangelog(state: DataFrame, changes: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("key"))
      .orderBy(col("ts_ms").desc, col("seq").desc)
    val latest = changes
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("key"), col("op"),
        col("value_e4").as("new_value_e4"), col("ts_ms").as("new_ms"))
    state.join(latest, Seq("key"), "full_outer")
      // op null = key untouched by this changelog -> state row survives
      .filter(coalesce(col("op") =!= "D", lit(true)))
      .select(
        col("key"),
        when(col("op") === "U", col("new_value_e4"))
          .otherwise(col("value_e4")).as("value_e4"),
        when(col("op") === "U", col("new_ms"))
          .otherwise(col("updated_ms")).as("updated_ms"))
  }

  /** Temporal validity intervals — the slowly-changing-dimension
    * (SCD type 2) view of an event stream: per `(user, event_type)`,
    * each event's value holds from its timestamp until the next event
    * of that key (`valid_to` null on the current/last row — the
    * open-ended "current" record a dimension table serves lookups
    * from; [[graft.operators.AsofJoin]] is the query-side twin that
    * reads such intervals). `event_id` breaks timestamp ties, matching
    * [[transitions]].
    *
    * One shuffle (the key window); values quantize e4 per row before
    * anything aggregates, per the exactness contract.
    */
  def validityIntervals(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_millis(col("ts")).as("valid_from"),
        floor(col("value") * 10000 + 0.5).cast("long").as("value_e4"),
        col("ts"))
      .withColumn("valid_to", unix_millis(lead(col("ts"), 1).over(w)))
      .drop("ts")
  }

  /** Half-life-decayed engagement score per user — the recency-weighted
    * feature a ranking/personalization pipeline derives from an event
    * log. Pinned integer semantics (no `exp`, no floats): the
    * reference time is the corpus's max event time (deterministic — no
    * wall clock in the dataflow), each event's age bucket is
    * `(t_ref − t) div halfLifeMs`, its weight
    * `w_e3 = 1000 div 2^min(bucket, 20)` (staircase halving; ≥20
    * half-lives rounds to zero), and it contributes
    * `value_e4 · w_e3 div 1000`. Output:
    * `(user_id, n_events, decayed_value_e4, latest_ms)`.
    *
    * Scale shape: one global max aggregate (1-row broadcast back), one
    * narrow weight projection, one grouped sum — the shuffle carries
    * (user_id, partial sums) only.
    */
  def decayedValue(events: DataFrame, halfLifeMs: Long): DataFrame = {
    require(halfLifeMs > 0, "halfLifeMs must be positive")
    val base = events.select(
      col("user_id"),
      unix_millis(col("ts")).as("t"),
      floor(col("value") * 10000 + 0.5).cast("long").as("value_e4"))
    val tref = base.agg(max(col("t")).as("t_ref"))
    base.join(broadcast(tref))
      .withColumn("bucket", expr(s"(t_ref - t) div $halfLifeMs"))
      .withColumn("w_e3",
        expr("1000 div (CAST(1 AS BIGINT) << CAST(least(bucket, 20) AS INT))"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(expr("(value_e4 * w_e3) div 1000")).as("decayed_value_e4"),
        max(col("t")).as("latest_ms"))
  }

  /** Time-bounded conversion funnel: like [[funnel]], but each step
    * beyond the first only counts if it lands within `maxGapMs` of the
    * previous step's completion (`prev_t < t <= prev_t + maxGapMs`),
    * first-touch-greedy per step — the "converted within an hour"
    * semantics every product-analytics engine ships next to the
    * unbounded funnel. Output `(step, event_type, n_users)`.
    *
    * Note the greedy caveat shared with every first-touch funnel: a
    * user who *could* convert via a later step-i occurrence is still
    * anchored to their earliest in-window one, so the count is the
    * greedy-path reach, not the max-flow reach. That is the semantics
    * the unbounded [[funnel]] pins too; the two differ only in the
    * gap predicate.
    *
    * Scale shape: identical to [[funnel]] — per-step narrow filter +
    * user-keyed min-agg, joined on the shrinking reached set; the gap
    * predicate rides the same join, adding no exchange.
    */
  def funnelWindowed(events: DataFrame, steps: Seq[String], maxGapMs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxGapMs > 0, "maxGapMs must be positive")
    val e = events.select(
      col("user_id"), col("event_type"), unix_millis(col("ts")).as("t"))
    var reached = e.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("t")).as("t"))
    var out = reached.agg(count(lit(1)).as("n_users"))
      .select(lit(1L).as("step"), lit(steps.head).as("event_type"), col("n_users"))
    for ((st, i) <- steps.zipWithIndex.drop(1)) {
      val prev = reached.select(col("user_id"), col("t").as("prev_t"))
      reached = e.filter(col("event_type") === st)
        .join(prev, "user_id")
        .filter(col("t") > col("prev_t") && col("t") <= col("prev_t") + maxGapMs)
        .groupBy(col("user_id")).agg(min(col("t")).as("t"))
      out = out.unionByName(reached.agg(count(lit(1)).as("n_users"))
        .select(lit((i + 1).toLong).as("step"), lit(st).as("event_type"), col("n_users")))
    }
    out
  }

  /** Rolling per-key anomaly flags, integer-exact: for each user's
    * event stream ordered by `(ts, event_id)`, compare the cent-
    * quantized value against the trailing window of the `lookback`
    * PRECEDING events (the row itself excluded — the score is
    * out-of-sample). An event is anomalous when its squared z-score
    * against that window exceeds `k²`, tested without ever forming a
    * double: with `n, s, q` the window's count / Σx / Σx²,
    *
    *   z² > k²  ⇔  (x·n − s)² > k² · (n·q − s²)
    *
    * — both sides exact BIGINTs (|x| ≤ 1e4 cents, n ≤ lookback, so
    * the cross terms stay ≤ ~1e12 even at 100 TB: magnitudes are
    * bounded by the VALUE domain and the window length, not the
    * corpus). Events with fewer than `minPrev` trailing samples are
    * never flagged (cold-start guard); a zero-variance window flags
    * any deviation (the strict `>` keeps exact-repeat values quiet).
    * Output: flagged rows only, `(event_id, user_id, t, v_e2, n_prev)`.
    *
    * Scale shape: ONE shuffle on `user_id` for the window pass over a
    * narrow 4-column projection; no self-join, no broadcast state —
    * the per-key rolling twin of the global [[SparkEntry]] `e_outliers`
    * composition. This is the batch form of what a stream would run
    * via `flatMapGroupsWithState` with an O(lookback) ring buffer.
    */
  def rollingAnomaly(events: DataFrame, lookback: Int = 8, minPrev: Int = 4,
      k: Int = 3): DataFrame = {
    require(lookback >= 1 && minPrev >= 1 && k >= 1,
      s"lookback/minPrev/k must be >= 1, got $lookback/$minPrev/$k")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-lookback, -1)
    events
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("t"),
        col("ts"), floor(col("value") * 100 + 0.5).cast("long").as("v_e2"))
      .withColumn("n_prev", count(col("v_e2")).over(w))
      .withColumn("s_prev", sum(col("v_e2")).over(w))
      .withColumn("q_prev", sum(col("v_e2") * col("v_e2")).over(w))
      .filter(col("n_prev") >= minPrev &&
        (col("v_e2") * col("n_prev") - col("s_prev")) *
          (col("v_e2") * col("n_prev") - col("s_prev")) >
          lit(k.toLong * k) *
            (col("n_prev") * col("q_prev") - col("s_prev") * col("s_prev")))
      .select(col("event_id"), col("user_id"), col("t"), col("v_e2"), col("n_prev"))
  }
}
