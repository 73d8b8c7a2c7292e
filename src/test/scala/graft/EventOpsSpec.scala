package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.operators.EventOps

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def t(ms: Long) = new Timestamp(ms)

  // (event_id, user_id, event_type, ts, value)
  private def ev: DataFrame = Seq(
    (1L, "u1", "click", t(0L), 1.0),
    (2L, "u1", "click", t(500L), 2.0),
    (3L, "u1", "view", t(1500L), 3.0),
    (4L, "u2", "click", t(1500L), 4.0)
  ).toDF("event_id", "user_id", "event_type", "ts", "value")

  test("tumbling windows: floor-aligned starts, exact e4 sums") {
    val out = EventOps.tumbling(ev, sizeMs = 1000L)
    assert(rowSet(out) === Set(
      Seq(0L, "click", 2L, 30000L),
      Seq(1000L, "view", 1L, 30000L),
      Seq(1000L, "click", 1L, 40000L)))
  }

  test("sliding windows: each event lands in size/slide windows") {
    val out = EventOps.sliding(ev, sizeMs = 2000L, slideMs = 1000L)
    // event@0 -> windows {0,-1000}; @500 -> {0,-1000}; @1500 x2 -> {1000,0}
    assert(rowSet(out) === Set(
      Seq(-1000L, "click", 2L, 30000L),
      Seq(0L, "click", 3L, 70000L),
      Seq(0L, "view", 1L, 30000L),
      Seq(1000L, "view", 1L, 30000L),
      Seq(1000L, "click", 1L, 40000L)))
  }

  test("sessions: gap at or beyond gapMs starts a new session") {
    val e = Seq(
      (1L, "u1", "x", t(0L), 0.0),
      (2L, "u1", "x", t(10L), 0.0),
      (3L, "u1", "x", t(2000L), 0.0),
      (4L, "u2", "x", t(5L), 0.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = EventOps.sessions(e, gapMs = 1000L)
    assert(rowSet(out) === Set(
      Seq("u1", 0L, 10L, 2L),
      Seq("u1", 2000L, 2000L, 1L),
      Seq("u2", 5L, 5L, 1L)))
  }

  test("applyChangelog: upsert, tombstone, insert, untouched, replay-idempotent") {
    val state = Seq(
      ("a", 100L, 10L), ("b", 200L, 10L), ("c", 300L, 10L))
      .toDF("key", "value_e4", "updated_ms")
    val changes = Seq(
      ("a", "U", 150L, 20L, 1L),  // upsert existing
      ("a", "D", 0L, 15L, 2L),    // older delete loses to the later U
      ("b", "D", 0L, 20L, 3L),    // tombstone removes b
      ("d", "U", 400L, 20L, 4L)   // insert unknown key
    ).toDF("key", "op", "value_e4", "ts_ms", "seq")
    val out = EventOps.applyChangelog(state, changes)
    assert(rowSet(out) === Set(
      Seq("a", 150L, 20L), Seq("c", 300L, 10L), Seq("d", 400L, 20L)))
    // same-timestamp ties break by seq: the D (seq 6) beats the U (seq 5)
    val tied = Seq(("c", "U", 999L, 30L, 5L), ("c", "D", 0L, 30L, 6L))
      .toDF("key", "op", "value_e4", "ts_ms", "seq")
    assert(rowSet(EventOps.applyChangelog(state, tied))
      === Set(Seq("a", 100L, 10L), Seq("b", 200L, 10L)))
    // replay idempotence: applying the changelog to its own output is a no-op
    val once = EventOps.applyChangelog(state, changes)
    assert(rowSet(EventOps.applyChangelog(once, changes)) === rowSet(once))
    // empty changelog is the identity
    val noChanges = Seq.empty[(String, String, Long, Long, Long)]
      .toDF("key", "op", "value_e4", "ts_ms", "seq")
    assert(rowSet(EventOps.applyChangelog(state, noChanges)) === rowSet(state))
  }

  test("validityIntervals: SCD2 windows chain per key; last row open-ended") {
    val out = EventOps.validityIntervals(ev)
      .collect().map(r => (r.getLong(2),
        (r.getString(0), r.getString(1), r.getLong(3),
          if (r.isNullAt(5)) null else r.getLong(5)))).toMap
    // u1 click: 0 -> 500 -> open; u1 view and u2 click singletons open
    assert(out(1L) === (("u1", "click", 0L, 500L)))
    assert(out(2L) === (("u1", "click", 500L, null)))
    assert(out(3L) === (("u1", "view", 1500L, null)))
    assert(out(4L) === (("u2", "click", 1500L, null)))
  }

  test("decayedValue: staircase half-life weights from the corpus max time") {
    // half-life 1000ms, t_ref = 3000: buckets 3,2,1,0 -> weights
    // 1000>>3=125, 250, 500, 1000 (integer staircase)
    val e = Seq(
      (1L, "u1", "x", t(0L), 8.0),     // bucket 3, w=125 -> 80000*125/1000 = 10000
      (2L, "u1", "x", t(1200L), 4.0),  // bucket 1, w=500 -> 40000*500/1000 = 20000
      (3L, "u2", "x", t(3000L), 1.0)   // bucket 0, w=1000 -> 10000
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = EventOps.decayedValue(e, 1000L)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out === Map(
      "u1" -> ((2L, 30000L, 1200L)),
      "u2" -> ((1L, 10000L, 3000L))))
    // ancient events (>20 half-lives) round to zero weight
    val old = Seq(
      (1L, "u1", "x", t(0L), 100.0),
      (2L, "u1", "x", t(100000L), 1.0)).toDF("event_id", "user_id", "event_type", "ts", "value")
    val o = EventOps.decayedValue(old, 1000L).collect().head
    assert(o.getLong(2) === 10000L, "the 100-half-life-old event must contribute 0")
  }

  test("latestPerKey keeps the newest event per (user, type)") {
    val out = EventOps.latestPerKey(ev)
    assert(rowSet(out) === Set(
      Seq("u1", "click", 2L, 500L),
      Seq("u1", "view", 3L, 1500L),
      Seq("u2", "click", 4L, 1500L)))
  }

  test("funnel: first-touch ordering — later steps only count after the first reach") {
    val e = Seq(
      // u1 converts in order: view@0 click@10 buy@20
      (1L, "u1", "view", t(0L), 0.0),
      (2L, "u1", "click", t(10L), 0.0),
      (3L, "u1", "buy", t(20L), 0.0),
      // u2 clicked BEFORE viewing; a later click converts
      (4L, "u2", "click", t(5L), 0.0),
      (5L, "u2", "view", t(10L), 0.0),
      (6L, "u2", "click", t(15L), 0.0),
      // u3 clicked only before its first view -> stops at step 1
      (7L, "u3", "click", t(5L), 0.0),
      (8L, "u3", "view", t(10L), 0.0),
      // u4 never viewed -> not in the funnel at all
      (9L, "u4", "buy", t(0L), 0.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = EventOps.funnel(e, Seq("view", "click", "buy"))
    assert(rowSet(out) === Set(
      Seq(1L, "view", 3L),   // u1, u2, u3
      Seq(2L, "click", 2L),  // u1, u2 (u2's click@15 > view@10)
      Seq(3L, "buy", 1L)))   // u1 only
    // same-timestamp events do NOT convert (strictly-after semantics)
    val tie = Seq(
      (1L, "u1", "view", t(100L), 0.0),
      (2L, "u1", "click", t(100L), 0.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    assert(rowSet(EventOps.funnel(tie, Seq("view", "click"))) ===
      Set(Seq(1L, "view", 1L), Seq(2L, "click", 0L)))
  }

  test("transitions: adjacent pairs per user, event_id breaks ts ties") {
    val e = Seq(
      (1L, "u1", "a", t(0L), 0.0),
      (2L, "u1", "b", t(10L), 0.0),
      (3L, "u1", "a", t(20L), 0.0),
      // u2: same ts -> order by event_id: c(4) then d(5)
      (4L, "u2", "c", t(0L), 0.0),
      (5L, "u2", "d", t(0L), 0.0),
      // u3: single event -> no transition
      (6L, "u3", "a", t(0L), 0.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    assert(rowSet(EventOps.transitions(e)) === Set(
      Seq("a", "b", 1L), Seq("b", "a", 1L), Seq("c", "d", 1L)))
  }

  test("retention: cohort by first period, per-offset distinct user counts") {
    // periodMs = 100 -> period index = ms div 100
    val e = Seq(
      // u1 first in period 0, active 0, 1 (twice), 3
      (1L, "u1", "x", t(5L), 0.0),
      (2L, "u1", "x", t(110L), 0.0),
      (3L, "u1", "x", t(190L), 0.0),
      (4L, "u1", "x", t(320L), 0.0),
      // u2 first in period 0, active 0 only
      (5L, "u2", "x", t(90L), 0.0),
      // u3 first in period 1, active 1 + 2
      (6L, "u3", "x", t(150L), 0.0),
      (7L, "u3", "x", t(250L), 0.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    assert(rowSet(EventOps.retention(e, periodMs = 100L)) === Set(
      Seq(0L, 0L, 2L), // u1, u2 in their cohort period
      Seq(0L, 1L, 1L), // u1 (duplicate period-1 events count once)
      Seq(0L, 3L, 1L), // u1 in period 3
      Seq(1L, 0L, 1L), // u3
      Seq(1L, 1L, 1L))) // u3 in period 2
  }

  test("funnelWindowed: per-step deadline binds, boundary inclusive, huge gap ≡ funnel") {
    val e = Seq(
      // u1 converts fully: click 500 after view, buy 700 after click
      (1L, "u1", "view", t(0L), 0.0),
      (2L, "u1", "click", t(500L), 0.0),
      (3L, "u1", "buy", t(1200L), 0.0),
      // u2 clicks 1500 after view — past the 1000 ms deadline
      (4L, "u2", "view", t(0L), 0.0),
      (5L, "u2", "click", t(1500L), 0.0),
      // u3: FIRST in-window click (100) anchors; buy at 1050 is within
      // its window (100+1000) even though the later click at 900 exists
      (6L, "u3", "view", t(0L), 0.0),
      (7L, "u3", "click", t(100L), 0.0),
      (8L, "u3", "click", t(900L), 0.0),
      (9L, "u3", "buy", t(1050L), 0.0),
      // u4 clicks EXACTLY at the deadline — inclusive
      (10L, "u4", "view", t(0L), 0.0),
      (11L, "u4", "click", t(1000L), 0.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    assert(rowSet(EventOps.funnelWindowed(e, Seq("view", "click", "buy"), 1000L)) === Set(
      Seq(1L, "view", 4L),
      Seq(2L, "click", 3L),  // u1, u3, u4
      Seq(3L, "buy", 2L)))   // u1, u3
    // a gap wider than every inter-event delta degenerates to funnel
    assert(rowSet(EventOps.funnelWindowed(e, Seq("view", "click", "buy"), 1000000L)) ===
      rowSet(EventOps.funnel(e, Seq("view", "click", "buy"))))
  }

  test("rollingAnomaly: spike flagged, cold start and exact repeats quiet") {
    // u1: five 1.00s then a 5.00 spike, then another 1.00
    val u1 = (1L to 5L).map(i => (i, "u1", "x", t(i * 1000L), 1.0)) ++
      Seq((6L, "u1", "x", t(6000L), 5.0), (7L, "u1", "x", t(7000L), 1.0))
    // u2: alternating 1/2 then 1.5 (exact window mean — quiet), then 10.0
    val u2 = Seq(
      (11L, "u2", "x", t(1000L), 1.0), (12L, "u2", "x", t(2000L), 2.0),
      (13L, "u2", "x", t(3000L), 1.0), (14L, "u2", "x", t(4000L), 2.0),
      (15L, "u2", "x", t(5000L), 1.5), (16L, "u2", "x", t(6000L), 10.0))
    // u3: spike with only 2 trailing samples — cold start, never flagged
    val u3 = Seq(
      (21L, "u3", "x", t(1000L), 1.0), (22L, "u3", "x", t(2000L), 1.0),
      (23L, "u3", "x", t(3000L), 99.0))
    val e = (u1 ++ u2 ++ u3).toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = EventOps.rollingAnomaly(e, lookback = 8, minPrev = 4, k = 3)
    // u1 event 6: window = five 100s (zero variance) -> any deviation flags;
    //   event 7: window has the spike; (100·6 − 1000)² = 160000 vs
    //   9·(6·300000 − 10⁶) = 7.2e6 -> quiet
    // u2 event 15: (150·4 − 600)² = 0 -> quiet (exact mean);
    //   event 16: (1000·5 − 750)² = 18_062_500 > 9·(5·122500 − 562500) -> flag
    assert(rowSet(out) === Set(
      Seq(6L, "u1", 6000L, 500L, 5L),
      Seq(16L, "u2", 6000L, 1000L, 5L)))
  }
}
