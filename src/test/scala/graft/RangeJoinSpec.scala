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

  test("overlapJoin: hand intervals with an open end; exactly-once; chunk-invariant") {
    // u1 clicks: [0,10), [20,30), [28, open); purchase: [5,25), [35, open)
    // open intervals close at max endpoint (35) + 1 = 36
    val a = Seq(
      ("u1", 1L, 0L, Some(10L)),
      ("u1", 2L, 20L, Some(30L)),
      ("u1", 3L, 28L, None: Option[Long])
    ).toDF("user_id", "id", "from_ms", "to_ms")
    val b = Seq(
      ("u1", 9L, 5L, Some(25L)),
      ("u1", 8L, 35L, None: Option[Long]),
      ("u2", 7L, 0L, Some(30L)) // different key: never pairs with u1
    ).toDF("user_id", "id", "from_ms", "to_ms")
    val expected = Set(
      Seq("u1", 1L, 9L, 5L, 10L, 5L),    // [0,10) ∩ [5,25)
      Seq("u1", 2L, 9L, 20L, 25L, 5L),   // [20,30) ∩ [5,25)
      Seq("u1", 3L, 8L, 35L, 36L, 1L))   // [28,36) ∩ [35,36)
    for (w <- Seq(1L, 7L, 1000L)) {
      val out = RangeJoin.overlapJoin(a, b, Seq("user_id"), w)
      assert(rowSet(out) === expected, s"chunkMs=$w")
      assert(out.count() === expected.size.toLong, s"chunkMs=$w dup")
    }
  }

  test("overlapJoin ≡ naive per-key predicate join on random intervals") {
    val rnd = new scala.util.Random(11)
    def gen(n: Int) = (1L to n.toLong).map { i =>
      val s = rnd.nextInt(1000).toLong
      (s"k${rnd.nextInt(5)}", i, s, s + 1 + rnd.nextInt(120).toLong)
    }
    val a = gen(120).toDF("user_id", "id", "from_ms", "to_ms")
    val b = gen(80).toDF("user_id", "id", "from_ms", "to_ms")
    val got = RangeJoin.overlapJoin(a, b, Seq("user_id"), 64L)
      .select(col("user_id"), col("id_a"), col("id_b"))
    val naive = a.select(col("user_id"), col("id").as("id_a"),
        col("from_ms").as("fa"), col("to_ms").as("ta"))
      .join(b.select(col("user_id"), col("id").as("id_b"),
        col("from_ms").as("fb"), col("to_ms").as("tb")), Seq("user_id"))
      .filter(col("fa") < col("tb") && col("fb") < col("ta"))
      .select(col("user_id"), col("id_a"), col("id_b"))
    assert(rowSet(got) === rowSet(naive))
    assert(got.count() === naive.count()) // emit-once, no dedup needed
  }

  test("overlapJoin plans as a hash equi-join on (key, chunk), never a product over pairs") {
    val a = (1L to 50L).map(i => ("u" + i % 3, i, i * 10, i * 10 + 25))
      .toDF("user_id", "id", "from_ms", "to_ms")
    val out = RangeJoin.overlapJoin(a, a, Seq("user_id"), 16L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"overlap join fell back to a cartesian plan:\n$plan")
    // the only nested loop allowed is the 1-row open-interval bound
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 2,
      s"pair join must not be a nested loop:\n$plan")
    assert(plan.contains("chunk"),
      s"chunk key missing from the join:\n$plan")
  }

  test("overlapJoin: zero-length intervals drop; empty sides yield empty output") {
    val a = Seq(("u", 1L, 5L, Some(5L))).toDF("user_id", "id", "from_ms", "to_ms")
    val b = Seq(("u", 2L, 0L, Some(10L))).toDF("user_id", "id", "from_ms", "to_ms")
    assert(RangeJoin.overlapJoin(a, b, Seq("user_id"), 4L).count() === 0)
    val empty = Seq.empty[(String, Long, Long, Option[Long])]
      .toDF("user_id", "id", "from_ms", "to_ms")
    assert(RangeJoin.overlapJoin(empty, b, Seq("user_id"), 4L).count() === 0)
    assert(RangeJoin.overlapJoin(empty, empty, Seq("user_id"), 4L).count() === 0)
  }
}
