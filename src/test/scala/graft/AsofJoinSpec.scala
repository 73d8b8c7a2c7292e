package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{AsofJoin, Similarity}

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(sec: Long) = new Timestamp(sec * 1000)

  test("as-of attaches the latest right row at-or-before each left time") {
    val left = Seq(
      (1L, "u1", t(10)), // after r@5 -> sees 5
      (2L, "u1", t(20)), // after r@20 (inclusive) -> sees 20
      (3L, "u1", t(3)),  // before any right -> null
      (4L, "u2", t(50))  // other key, no right rows -> null
    ).toDF("id", "k", "lt")
    val right = Seq(
      ("u1", t(5), 100L, "a"),
      ("u1", t(20), 200L, "b"),
      ("u1", t(30), 300L, "c")
    ).toDF("k", "rt", "rid", "payload")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "lt", "rt",
      Seq("rid", "payload"), "rid")
    assert(rowSet(out) === Set(
      Seq(1L, "u1", t(10), 100L, "a"),
      Seq(2L, "u1", t(20), 200L, "b"),
      Seq(3L, "u1", t(3), null, null),
      Seq(4L, "u2", t(50), null, null)))
  }

  test("ties among right rows at one timestamp resolve to the max tiebreak") {
    val left = Seq((1L, "u1", t(10))).toDF("id", "k", "lt")
    val right = Seq(
      ("u1", t(10), 7L, "low"), ("u1", t(10), 9L, "high"), ("u1", t(10), 8L, "mid")
    ).toDF("k", "rt", "rid", "payload")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "lt", "rt",
      Seq("rid", "payload"), "rid")
    assert(rowSet(out) === Set(Seq(1L, "u1", t(10), 9L, "high")))
  }

  test("non-numeric tiebreak orders by natural type, matching the native exec") {
    // a string tiebreak would become all-null under a cast("long")
    // ordering — ties must still resolve deterministically to the max
    val left = Seq((1L, "u1", t(10))).toDF("id", "k", "lt")
    val right = Seq(
      ("u1", t(10), "aa", 1L), ("u1", t(10), "zz", 2L), ("u1", t(10), "mm", 3L)
    ).toDF("k", "rt", "tag", "rid")
    val windowed = AsofJoin.asofJoin(left, right, Seq("k"), "lt", "rt",
      Seq("tag", "rid"), "tag")
    assert(rowSet(windowed) === Set(Seq(1L, "u1", t(10), "zz", 2L)))
    val native = AsofJoin.asofJoinNative(left, right, Seq("k"), "lt", "rt",
      Seq("tag", "rid"), "tag")
    assert(rowSet(native) === rowSet(windowed))
  }

  test("native as-of exec: same semantics as the union+window form") {
    val left = Seq(
      (1L, "u1", t(10)), (2L, "u1", t(20)), (3L, "u1", t(3)), (4L, "u2", t(50))
    ).toDF("id", "k", "lt")
    val right = Seq(
      ("u1", t(5), 100L, "a"), ("u1", t(20), 200L, "b"), ("u1", t(30), 300L, "c")
    ).toDF("k", "rt", "rid", "payload")
    val native = AsofJoin.asofJoinNative(left, right, Seq("k"), "lt", "rt",
      Seq("rid", "payload"), "rid")
    val windowed = AsofJoin.asofJoin(left, right, Seq("k"), "lt", "rt",
      Seq("rid", "payload"), "rid")
    assert(rowSet(native) === rowSet(windowed))
  }

  test("native as-of exec: tiebreak, plan shape, and randomized equivalence") {
    // max-tiebreak at equal times
    val left = Seq((1L, "u1", t(10))).toDF("id", "k", "lt")
    val right = Seq(
      ("u1", t(10), 7L, "low"), ("u1", t(10), 9L, "high"), ("u1", t(10), 8L, "mid")
    ).toDF("k", "rt", "rid", "payload")
    val out = AsofJoin.asofJoinNative(left, right, Seq("k"), "lt", "rt",
      Seq("rid", "payload"), "rid")
    assert(rowSet(out) === Set(Seq(1L, "u1", t(10), 9L, "high")))

    // the custom exec is actually planned, with planner-inserted
    // exchanges + sorts on both sides
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"custom exec not planned:\n$plan")
    assert(!plan.contains("!AsofJoin"), s"exec flagged invalid (missing input):\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size >= 2, plan)
    assert("Sort ".r.findAllIn(plan).size >= 2, plan)

    // randomized equivalence vs the union+window form (fixed seed)
    val rnd = new scala.util.Random(42)
    val bigLeft = (1L to 300L).map(i =>
      (i, s"u${rnd.nextInt(8)}", t(rnd.nextInt(100).toLong))).toDF("id", "k", "lt")
    val bigRight = (1L to 200L).map(i =>
      (s"u${rnd.nextInt(10)}", t(rnd.nextInt(100).toLong), i, s"p$i")).toDF("k", "rt", "rid", "payload")
    val n = AsofJoin.asofJoinNative(bigLeft, bigRight, Seq("k"), "lt", "rt",
      Seq("rid", "payload"), "rid")
    val w = AsofJoin.asofJoin(bigLeft, bigRight, Seq("k"), "lt", "rt",
      Seq("rid", "payload"), "rid")
    assert(rowSet(n) === rowSet(w))
  }

  test("IVF top-k equals brute force when queries probe all cells") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.5f, 0.5f)), (4L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    // nCentroids = 5 (every vector its own cell), nProbe = 5 -> exhaustive
    val ivf = Similarity.ivfTopK(emb, col("vec_id") === 0, 5, 5, 3)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
    val brute = Similarity.cosineTopK(emb, col("vec_id") === 0, 3)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
    assert(rowSet(ivf) === rowSet(brute))
  }

  test("IVF with fewer probes returns a subset of candidates, k per query max") {
    val emb = (0L until 40L).map { i =>
      (i, Array((i % 7).toFloat + 0.3f, (i % 5).toFloat - 1.2f, (i % 3).toFloat))
    }.toDF("vec_id", "embedding")
    val out = Similarity.ivfTopK(emb, col("vec_id") < 4, 8, 2, 5)
      .groupBy(col("query_id")).count()
    assert(out.collect().forall(_.getLong(1) <= 5))
  }
}
