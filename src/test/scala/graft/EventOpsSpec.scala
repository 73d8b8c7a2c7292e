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

  test("latestPerKey keeps the newest event per (user, type)") {
    val out = EventOps.latestPerKey(ev)
    assert(rowSet(out) === Set(
      Seq("u1", "click", 2L, 500L),
      Seq("u1", "view", 3L, 1500L),
      Seq("u2", "click", 4L, 1500L)))
  }
}
