package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.model.{RelationshipDoc, Stats}
import graft.operators.GraphOps
import graft.pipelines.Pipelines

class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val docs = Seq(
    RelationshipDoc(ts("2024-01-01 00:00:00"), "A", "B", Stats(3, 7)),
    RelationshipDoc(ts("2024-02-01 00:00:00"), "A", "B", Stats(5, 2)),
    RelationshipDoc(ts("2024-03-01 00:00:00"), "B", "C", Stats(1, 9)))

  test("bulk pipeline writes all four triple families to one directory") {
    val out = Files.createTempDirectory("graft_rdf").toString
    val users = Seq("A").toDF("person_id_user")
    val tm = Seq(("T1", "A"), ("T1", "B")).toDF("team_id", "person_id")
    Pipelines.bulk(docs.toDF(), users, tm, out)
    val lines = spark.read.text(out).as[String].collect().toSet
    assert(lines.contains("_:T1 <team_id> \"T1\" ."))
    assert(lines.contains("_:T1 <has_member> _:A ."))
    assert(lines.contains("_:A <person_id> \"A\" ."))
    assert(lines.contains("_:A <is_trove_user> \"true\"^^<xs:boolean> ."))
    assert(lines.contains("_:B <is_trove_user> \"false\"^^<xs:boolean> ."))
    assert(lines.contains("_:A <has_connection> _:B (score=5) ."))
    assert(lines.contains("_:C <has_connection> _:B (score=9) ."))
  }

  test("bulk pipeline emits person triples for team-only members") {
    // D is a team member but appears in NO edge (the reference's uMap
    // covers it via the team phase, cmd/bulk/main.go:124-131); its
    // has_member triple must not point at a blank node with no person_id
    val users = Seq("A").toDF("person_id_user")
    val tm = Seq(("T1", "A"), ("T1", "D")).toDF("team_id", "person_id")
    val triples = Pipelines.bulkTriples(docs.toDF(), users, tm)
    val lines = strings(triples, "triple")
    assert(lines.contains("_:T1 <has_member> _:D ."))
    assert(lines.contains("_:D <person_id> \"D\" ."))
    assert(lines.contains("_:D <is_trove_user> \"false\"^^<xs:boolean> ."))
    // edge-derived persons still present exactly once
    assert(lines.contains("_:C <person_id> \"C\" ."))
    assert(triples.filter(col("triple").contains("<person_id>")).count() === 4) // A B C D
  }

  test("incremental etl over split watermarks equals one-shot merge of all docs") {
    val full = GraphOps.mergeMaxEdges(GraphOps.edgesFromDocs(docs.toDF()))
    // run 1: everything before Feb 15; run 2: the rest, merged into run 1
    val s1 = Pipelines.etlIncrement(None, docs.toDF()
      .filter(col("last_update") < lit(ts("2024-02-15 00:00:00"))), ts("1970-01-01 00:00:00"))
    val s2 = Pipelines.etlIncrement(Some(s1), docs.toDF(), ts("2024-02-15 00:00:00"))
    assert(rowSet(s2) === rowSet(full))
  }

  test("etl state round-trips through parquet") {
    val dir = Files.createTempDirectory("graft_state").toString + "/state"
    assert(Pipelines.readState(spark, dir).isEmpty)
    val s1 = Pipelines.etlIncrement(None, docs.toDF(), ts("1970-01-01 00:00:00"))
    Pipelines.writeState(s1, dir)
    val back = Pipelines.readState(spark, dir)
    assert(back.isDefined)
    assert(rowSet(back.get) === rowSet(s1))
  }

  test("atomic state write: every crash window leaves a readable full state") {
    val dir = Files.createTempDirectory("graft_atomic").toString + "/state"
    val s1 = Pipelines.etlIncrement(None, docs.toDF(), ts("1970-01-01 00:00:00"))

    // normal path: staging promoted to main, no staging residue
    Pipelines.writeStateAtomic(s1, dir)
    assert(rowSet(Pipelines.readStateSafe(spark, dir).get) === rowSet(s1))
    assert(!new java.io.File(dir + ".staging").exists())

    // crash between delete(main) and rename: only a COMPLETE staging dir
    // remains -> fallback must read it
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(dir), new org.apache.hadoop.fs.Path(dir + ".staging"))
    assert(rowSet(Pipelines.readStateSafe(spark, dir).get) === rowSet(s1))

    // crash mid-staging-write: staging without _SUCCESS is IGNORED
    fs.delete(new org.apache.hadoop.fs.Path(dir + ".staging/_SUCCESS"), false)
    assert(Pipelines.readStateSafe(spark, dir).isEmpty)
  }

  test("bucketed state: merge joins two bucketed tables with zero exchanges") {
    import graft.model.Edge
    val s1 = Seq(Edge("A", "B", 5), Edge("X", "Y", 2)).toDF()
    val s2 = Seq(Edge("A", "B", 7), Edge("B", "C", 1)).toDF()
    Pipelines.writeStateBucketed(s1, "state_old", 4)
    Pipelines.writeStateBucketed(s2, "state_new", 4)
    val old = Pipelines.readStateTable(spark, "state_old").get
    val nw = Pipelines.readStateTable(spark, "state_new").get
    val merged = GraphOps.mergeEdgeStates(old, nw)
    assert(rowSet(merged) === Set(
      Seq("A", "B", 7.0), Seq("X", "Y", 2.0), Seq("B", "C", 1.0)))
    merged.collect()
    val plan = merged.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed merge should not shuffle either side:\n$plan")
  }

  test("approx distinct stays within HLL++ error of the exact count") {
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val exact = li.select(countDistinct(col("l_orderkey"))).head().getLong(0)
    val approx = li.select(approx_count_distinct(col("l_orderkey"))).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1)
  }

  test("hop query matches the reference DQL shape on a toy team") {
    val tm = Seq(("T1", "A")).toDF("team_id", "person_id")
    val edges = GraphOps.mergeMaxEdges(GraphOps.edgesFromDocs(docs.toDF()))
    // from {A}: hop1 = {B}; hop2 = connections(B) − {A,B} = {C}
    assert(strings(Pipelines.hopQuery(edges, tm, "T1", 2), "person_id") === Set("C"))
  }

  test("hop query JSON projection: golden string of the nested DQL response shape") {
    val tm = Seq(("T1", "A")).toDF("team_id", "person_id")
    val edges = GraphOps.mergeMaxEdges(GraphOps.edgesFromDocs(docs.toDF()))
    // from {A}: hop1 = {B} (A's only connection), hop2 = {C}
    // (connections of B minus {B} minus {A}) — the nested document
    // pins field order, array order, and the empty-expansion rule
    assert(Pipelines.hopQueryJson(edges, tm, "T1").head().getString(0) ===
      """{"hop1_count":[{"person_id":"B","has_connection":[{"person_id":"C"}]}],"hop2_count":[{"person_id":"C"}]}""")
    // richer graph: two hop-1 persons, one with an empty (fully
    // filtered) expansion; hop2 union sorted
    val e2 = Seq(("A", "B"), ("A", "X"), ("B", "C"), ("B", "A"), ("X", "B"), ("C", "D"))
      .toDF("src", "dst")
    assert(Pipelines.hopQueryJson(e2, tm, "T1").head().getString(0) ===
      """{"hop1_count":[{"person_id":"B","has_connection":[{"person_id":"C"}]},{"person_id":"X","has_connection":[]}],"hop2_count":[{"person_id":"C"}]}""")
    // the flat hop-2 rows and the document's hop2_count agree (the
    // oracle-verified j4 semantics are the document's source of truth)
    assert(strings(Pipelines.hopQuery(e2, tm, "T1", 2), "person_id") === Set("C"))
    // empty team: both arrays empty, still one well-formed document
    assert(Pipelines.hopQueryJson(e2, tm, "NOPE").head().getString(0) ===
      """{"hop1_count":[],"hop2_count":[]}""")
  }

  test("kHop with aggressive checkpointing matches un-checkpointed result") {
    val edges = Seq(
      graft.model.Edge("A", "B", 1), graft.model.Edge("B", "C", 1),
      graft.model.Edge("C", "D", 1), graft.model.Edge("D", "E", 1)).toDF()
    val seeds = Seq("A").toDF("person_id")
    val plain = strings(GraphOps.kHop(edges, seeds, 4, checkpointEvery = 0), "person_id")
    val ckpt = strings(GraphOps.kHop(edges, seeds, 4, checkpointEvery = 1), "person_id")
    assert(plain === ckpt)
    assert(plain === Set("E"))
  }
}
