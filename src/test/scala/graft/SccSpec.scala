package graft

import org.apache.spark.sql.DataFrame

import graft.operators.GraphOps

/** Strongly connected components ([[GraphOps.sccLabels]]) — hand
  * graphs for every structural case the FW-BW-Trim coloring must get
  * right, plus a brute-force mutual-reachability differential on
  * seeded random digraphs (the oracle's definition computed in-JVM
  * with Floyd–Warshall, so the spec pins the SEMANTICS independently
  * of the DuckDB harness).
  */
class SccSpec extends SparkSpec {
  import spark.implicits._

  private def scc(edges: Seq[(String, String)]): Map[String, String] =
    GraphOps.sccLabels(edges.toDF("src", "dst"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("scc: cycles, bridge, pendant, self-loops — hand graph") {
    // cycle {a,b,c}; cycle {d,e}; DAG bridge c->d; pendant f->a;
    // self-loop-only g; h has a self-loop AND an edge into the cycle
    // but no return path — singleton, exactly one output row
    val labels = scc(Seq(
      "a" -> "b", "b" -> "c", "c" -> "a",
      "d" -> "e", "e" -> "d",
      "c" -> "d",
      "f" -> "a",
      "g" -> "g",
      "h" -> "h", "h" -> "a"))
    assert(labels === Map(
      "a" -> "a", "b" -> "a", "c" -> "a",
      "d" -> "d", "e" -> "d",
      "f" -> "f", "g" -> "g", "h" -> "h"))
  }

  test("scc: pure chain peels to singletons (trim path)") {
    val vs = (1 to 8).map(i => f"v$i%02d")
    val labels = scc(vs.zip(vs.tail).map { case (a, b) => a -> b })
    assert(labels === vs.map(v => v -> v).toMap)
  }

  test("scc: chain of 2-cycles (condensation depth > 1)") {
    // x1<->y1 -> x2<->y2 -> x3<->y3: three 2-vertex SCCs in a chain
    val labels = scc(Seq(
      "x1" -> "y1", "y1" -> "x1", "y1" -> "x2",
      "x2" -> "y2", "y2" -> "x2", "y2" -> "x3",
      "x3" -> "y3", "y3" -> "x3"))
    assert(labels === Map(
      "x1" -> "x1", "y1" -> "x1",
      "x2" -> "x2", "y2" -> "x2",
      "x3" -> "x3", "y3" -> "x3"))
  }

  test("scc: duplicate edges and empty input") {
    val dup = scc(Seq("a" -> "b", "a" -> "b", "b" -> "a", "b" -> "a"))
    assert(dup === Map("a" -> "a", "b" -> "a"))
    val empty = GraphOps.sccLabels(
      Seq.empty[(String, String)].toDF("src", "dst"))
    assert(empty.count() === 0)
  }

  test("condensationEdges: contracted DAG of the hand graph; acyclic") {
    val edges = Seq(
      "a" -> "b", "b" -> "c", "c" -> "a",
      "d" -> "e", "e" -> "d",
      "c" -> "d", "f" -> "a", "h" -> "a").toDF("src", "dst")
    val labels = GraphOps.sccLabels(edges)
    val cond = GraphOps.condensationEdges(edges, labels)
      .as[(String, String)].collect().toSet
    assert(cond === Set(("a", "d"), ("f", "a"), ("h", "a")))
    // acyclicity (the SCC definition guarantees it): the contracted
    // closure must contain no mutual pair
    var closure = cond
    var grew = true
    while (grew) {
      val next = closure ++ (for {
        (x, y) <- closure; (y2, z) <- closure if y2 == y
      } yield (x, z))
      grew = next.size > closure.size
      closure = next
    }
    assert(!closure.exists { case (x, y) => closure.contains((y, x)) },
      s"condensation has a cycle: $closure")
  }

  /** Mutual-reachability ground truth: Floyd–Warshall closure, label =
    * min mutually reachable vertex (the oracle's definition).
    */
  private def bruteScc(n: Int, edges: Seq[(Int, Int)]): Map[String, String] = {
    val reach = Array.fill(n, n)(false)
    for (i <- 0 until n) reach(i)(i) = true
    for ((a, b) <- edges) reach(a)(b) = true
    for (k <- 0 until n; i <- 0 until n if reach(i)(k);
         j <- 0 until n if reach(k)(j)) reach(i)(j) = true
    (0 until n).map { v =>
      val lbl = (0 until n)
        .filter(u => reach(v)(u) && reach(u)(v)).min
      f"n$v%02d" -> f"n$lbl%02d"
    }.toMap
  }

  test("scc: differential vs Floyd–Warshall on seeded random digraphs") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val n = 10
      val edges = (0 until 24).map(_ => (rnd.nextInt(n), rnd.nextInt(n)))
        .filter { case (a, b) => a != b }.distinct
      val expected = bruteScc(n, edges)
      val touched = edges.flatMap { case (a, b) => Seq(a, b) }.toSet
      val got = scc(edges.map { case (a, b) => (f"n$a%02d", f"n$b%02d") })
      // the operator labels only vertices that appear in an edge
      assert(got === expected.filter { case (v, _) =>
        touched.contains(v.drop(1).toInt) },
        s"seed=$seed edges=$edges")
    }
  }

  test("scc: labels are a partition — every member of a label class is mutually reachable with its root") {
    // one denser seeded digraph; cross-check the partition property
    val rnd = new scala.util.Random(99)
    val n = 14
    val edges = (0 until 50).map(_ => (rnd.nextInt(n), rnd.nextInt(n)))
      .filter { case (a, b) => a != b }.distinct
    val expected = bruteScc(n, edges)
    val got = scc(edges.map { case (a, b) => (f"n$a%02d", f"n$b%02d") })
    for ((v, lbl) <- got) assert(expected(v) === lbl, s"vertex $v")
  }
}
