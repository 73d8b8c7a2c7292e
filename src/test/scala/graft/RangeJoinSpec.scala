package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq(
    (1L, 5L), (2L, 10L), (3L, 15L), (4L, 100L), (5L, -3L)
  ).toDF("pid", "t")
  private val intervals = Seq(
    (10L, 0L, 10L),    // catches 5, 10, -3? no: [0,10] -> 5, 10
    (20L, 10L, 14L),   // catches 10
    (30L, -5L, -1L),   // catches -3
    (40L, 50L, 60L)    // catches nothing
  ).toDF("iid", "s", "e")

  private val expected = Set(
    Seq(1L, 10L), Seq(2L, 10L), Seq(2L, 20L), Seq(5L, 30L))

  test("containment is inclusive on both bounds, no duplicates") {
    val out = RangeJoin.intervalJoin(points, "t", intervals, "s", "e", 4L)
      .select(col("pid"), col("iid"))
    assert(out.collect().length === expected.size) // exactly-once per pair
    assert(rowSet(out) === expected)
  }

  test("result is independent of the bucket width") {
    for (w <- Seq(1L, 3L, 7L, 1000L)) {
      val out = RangeJoin.intervalJoin(points, "t", intervals, "s", "e", w)
        .select(col("pid"), col("iid"))
      assert(rowSet(out) === expected, s"bucketWidth=$w")
      assert(out.collect().length === expected.size, s"bucketWidth=$w dup")
    }
  }

  test("inverted intervals are dropped, not exploded into junk buckets") {
    val bad = intervals.union(Seq((99L, 1000000L, 0L)).toDF("iid", "s", "e"))
    val out = RangeJoin.intervalJoin(points, "t", bad, "s", "e", 4L)
      .select(col("pid"), col("iid"))
    assert(rowSet(out) === expected)
  }

  test("plans as an equi-join on the bucket — never nested-loop/cartesian") {
    val plan = RangeJoin.intervalJoin(points, "t", intervals, "s", "e", 4L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a product plan:\n$plan")
    assert(plan.contains("__bucket"), s"bucket key missing from the join:\n$plan")
  }

  test("equivalent to the naive cross+filter join on random data") {
    val rnd = new scala.util.Random(7)
    val ps = (1L to 200L).map(i => (i, rnd.nextInt(1000).toLong)).toDF("pid", "t")
    val ivs = (1L to 60L).map { i =>
      val s = rnd.nextInt(1000).toLong; (i, s, s + rnd.nextInt(80).toLong)
    }.toDF("iid", "s", "e")
    val bucketed = RangeJoin.intervalJoin(ps, "t", ivs, "s", "e", 32L)
      .select(col("pid"), col("iid"))
    val naive = ps.crossJoin(ivs)
      .filter(col("t") >= col("s") && col("t") <= col("e"))
      .select(col("pid"), col("iid"))
    assert(rowSet(bucketed) === rowSet(naive))
    assert(bucketed.count() === naive.count())
  }
}
