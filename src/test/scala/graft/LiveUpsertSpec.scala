package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.functions._

import graft.model.{RelationshipDoc, Stats}
import graft.operators.GraphOps
import graft.sinks.{LiveGraphStore, LiveGraphStoreFactory, LiveUpsert}

/** Parquet-backed fake live store: state loads from / saves to a
  * parquet path; upserts land in a shared JVM-wide map with an atomic
  * per-key max merge — the same atomicity `upsertIfGreater` demands of
  * a real store. local-mode executors share the JVM, so the map IS the
  * "remote" store.
  */
object FakeGraphStore {
  val state = new ConcurrentHashMap[(String, String), java.lang.Double]()

  class Conn extends LiveGraphStore {
    var closed = false
    override def upsertIfGreater(src: String, dst: String, score: Double): Unit =
      state.merge((src, dst), score, (a, b) => math.max(a, b))
    override def close(): Unit = closed = true
  }

  class Factory extends LiveGraphStoreFactory {
    override def open(partitionId: Int): LiveGraphStore = new Conn
  }
}

class LiveUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val prior = Seq(
    ("A", "B", 5.0), ("B", "A", 1.0), ("X", "Y", 9.0))

  private val docs = Seq(
    RelationshipDoc(ts("2024-01-01 00:00:00"), "A", "B", Stats(3, 7)), // 3 < 5 keep, 7 > 1 upsert
    RelationshipDoc(ts("2024-02-01 00:00:00"), "A", "B", Stats(4, 2)), // pre-merged away
    RelationshipDoc(ts("2024-03-01 00:00:00"), "C", "D", Stats(8, 6))) // create

  test("live upsert end-state equals the set-oriented mergeEdgeStates") {
    val dir = Files.createTempDirectory("graft_live").toString + "/state"
    prior.toDF("src", "dst", "score").write.parquet(dir)

    // load prior state from parquet into the store
    FakeGraphStore.state.clear()
    spark.read.parquet(dir).collect()
      .foreach(r => FakeGraphStore.state.put((r.getString(0), r.getString(1)), r.getDouble(2)))

    val edges = GraphOps.edgesFromDocs(docs.toDF())
    LiveUpsert.writeUpserts(edges, new FakeGraphStore.Factory)

    // save the store back to parquet and compare against the batch twin
    import scala.jdk.CollectionConverters._
    val outDir = Files.createTempDirectory("graft_live_out").toString + "/state"
    FakeGraphStore.state.asScala.toSeq
      .map { case ((s, d), v) => (s, d, v.doubleValue) }
      .toDF("src", "dst", "score").write.parquet(outDir)

    val expected = GraphOps.mergeEdgeStates(
      prior.toDF("src", "dst", "score"),
      GraphOps.mergeMaxEdges(edges))
    assert(rowSet(spark.read.parquet(outDir)) === rowSet(expected))
    assert(rowSet(spark.read.parquet(outDir)) === Set(
      Seq("A", "B", 5.0), Seq("B", "A", 7.0), Seq("X", "Y", 9.0),
      Seq("C", "D", 8.0), Seq("D", "C", 6.0)))
  }

  test("live upsert is idempotent under replay (task-retry safety)") {
    FakeGraphStore.state.clear()
    val edges = GraphOps.edgesFromDocs(docs.toDF())
    LiveUpsert.writeUpserts(edges, new FakeGraphStore.Factory)
    val once = Map.newBuilder
      .++=(scala.jdk.CollectionConverters.MapHasAsScala(FakeGraphStore.state).asScala)
      .result()
    // full replay of the same batch (a retried stage in the extreme)
    LiveUpsert.writeUpserts(edges, new FakeGraphStore.Factory)
    val twice = scala.jdk.CollectionConverters.MapHasAsScala(FakeGraphStore.state).asScala
    assert(twice === once)
  }

  // ---- real embedded store (Apache Derby, in-process JDBC) ----------------
  // The FakeGraphStore tests prove the sink's set-oriented algebra; these
  // prove the SAME end-state and replay-idempotency against a real
  // transactional store with a real atomic MERGE — the closest the harness
  // (no live Dgraph/MySQL) gets to the reference's dgraph.go:175-223 path.

  private def derbyUrl(name: String): String = {
    // keep derby.log out of the repo working dir (must be set before the
    // engine boots; harmless afterwards)
    System.setProperty("derby.stream.error.file",
      Files.createTempDirectory("graft_derby_log").resolve("derby.log").toString)
    val dir = Files.createTempDirectory("graft_derby").resolve(name)
    s"jdbc:derby:$dir;create=true"
  }

  private def readStore(url: String): Set[Seq[Any]] = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        "SELECT src, dst, score FROM edge_state")
      val b = Set.newBuilder[Seq[Any]]
      while (rs.next()) b += Seq(rs.getString(1), rs.getString(2), rs.getDouble(3))
      b.result()
    } finally conn.close()
  }

  test("derby-backed upsert end-state equals mergeEdgeStates") {
    val url = derbyUrl("state_eq")
    graft.sinks.JdbcGraphStore.ensureTable(url)
    // seed prior state through the store's own upsert path
    val conn = new graft.sinks.JdbcGraphStoreFactory(url).open(0)
    try prior.foreach { case (s, d, v) => conn.upsertIfGreater(s, d, v) }
    finally conn.close()

    val edges = GraphOps.edgesFromDocs(docs.toDF())
    LiveUpsert.writeUpserts(edges, new graft.sinks.JdbcGraphStoreFactory(url))

    val expected = GraphOps.mergeEdgeStates(
      prior.toDF("src", "dst", "score"),
      GraphOps.mergeMaxEdges(edges))
    assert(readStore(url) === rowSet(expected))
    assert(readStore(url) === Set(
      Seq("A", "B", 5.0), Seq("B", "A", 7.0), Seq("X", "Y", 9.0),
      Seq("C", "D", 8.0), Seq("D", "C", 6.0)))
  }

  test("derby-backed upsert is idempotent under replay") {
    val url = derbyUrl("state_replay")
    graft.sinks.JdbcGraphStore.ensureTable(url)
    val edges = GraphOps.edgesFromDocs(docs.toDF())
    LiveUpsert.writeUpserts(edges, new graft.sinks.JdbcGraphStoreFactory(url))
    val once = readStore(url)
    LiveUpsert.writeUpserts(edges, new graft.sinks.JdbcGraphStoreFactory(url))
    assert(readStore(url) === once)
  }

  test("derby merge is upsert-if-GREATER: lower and equal scores never regress state") {
    val url = derbyUrl("state_monotone")
    graft.sinks.JdbcGraphStore.ensureTable(url)
    val c = new graft.sinks.JdbcGraphStoreFactory(url, commitEvery = 2).open(0)
    try {
      c.upsertIfGreater("A", "B", 5.0)
      c.upsertIfGreater("A", "B", 3.0) // lower: no-op
      c.upsertIfGreater("A", "B", 5.0) // equal: no-op
      c.upsertIfGreater("A", "B", 6.0) // greater: wins
    } finally c.close()
    assert(readStore(url) === Set(Seq("A", "B", 6.0)))
  }
}
