package graft.pipelines

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.GraphOps
import graft.sinks.Rdf

/** End-to-end pipelines — the Spark shapes of the reference's three
  * binaries (SURVEY §3). Each composes the operator library; none holds
  * driver-side state.
  */
object Pipelines {

  /** §3.2 `bulk` — batch inputs → RDF triple directory for the offline
    * bulk loader. Four triple projections over three shared frames:
    * the edge scan feeds both the person path (distinct + trove flag)
    * and the edge path (max-merge); teams feed team + membership
    * triples. Catalyst reuses the exchange under the two consumers of
    * `edges` where beneficial; at 100 TB each branch is an independent
    * scan+shuffle — no driver materialization anywhere.
    */
  def bulk(
      docs: DataFrame,
      users: DataFrame,
      teamMembers: DataFrame,
      outDir: String,
      watermark: Option[Timestamp] = None): Unit =
    Rdf.writeTriples(outDir, bulkTriples(docs, users, teamMembers, watermark))

  /** The full triple output of the bulk pipeline as one DataFrame —
    * the oracle-gated form of [[bulk]].
    *
    * The person set is edge endpoints ∪ team members: the reference
    * emits `person_id`/`is_trove_user` triples for EVERY team member
    * via the shared uMap in the team phase (cmd/bulk/main.go:124-131
    * calling createRDFUser), including members that never appear in an
    * ES edge — deriving persons from edges alone would leave
    * `has_member` pointing at blank nodes with no `person_id`.
    * One distinct over the union; the endpoint projections dominate it
    * at scale, so the member union adds no extra corpus shuffle.
    */
  def bulkTriples(
      docs: DataFrame,
      users: DataFrame,
      teamMembers: DataFrame,
      watermark: Option[Timestamp] = None): DataFrame = {
    val scanned = watermark.fold(docs)(GraphOps.watermarkFilter(docs, _))
    val edges = GraphOps.edgesFromDocs(scanned)
    val personIds = edges.select(col("src").as("person_id"))
      .union(edges.select(col("dst").as("person_id")))
      .union(teamMembers.select(col("person_id")))
      .distinct()
    val persons = GraphOps.markTroveUsers(personIds, users)
    val merged = GraphOps.mergeMaxEdges(edges)
    val teams = teamMembers.select(col("team_id")).distinct()
    Rdf.teamTriples(teams)
      .union(Rdf.teamMemberTriples(teamMembers))
      .union(Rdf.personTriples(persons))
      .union(Rdf.edgeTriples(merged))
  }

  /** §3.1 `etl` — incremental batch: docs at/after the watermark are
    * merged (upsert-if-greater) into prior edge state; returns the new
    * state. Persist with [[writeState]] / read with [[readState]] —
    * the parquet state is the "graph store" and the merge is
    * conflict-free by construction (no reference-style txn retries).
    */
  def etlIncrement(priorState: Option[DataFrame], docs: DataFrame, watermark: Timestamp): DataFrame = {
    val fresh = GraphOps.mergeMaxEdges(
      GraphOps.edgesFromDocs(GraphOps.watermarkFilter(docs, watermark)))
    priorState.fold(fresh)(GraphOps.mergeEdgeStates(_, fresh))
  }

  /** Edge-state sink: plain parquet keeps the state portable. */
  def writeState(state: DataFrame, path: String): Unit =
    state.write.mode("overwrite").parquet(path)

  private def fs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Existence via the Hadoop filesystem of the PATH (java.io.File
    * would silently report s3a://… / hdfs://… state as absent and the
    * incremental merge would quietly start from scratch every batch).
    */
  def readState(spark: SparkSession, path: String): Option[DataFrame] = {
    val (hfs, p) = fs(spark, path)
    if (hfs.exists(p)) Some(spark.read.parquet(path)) else None
  }

  /** Crash-safe state replacement: write the new state to a staging
    * dir (parquet's `_SUCCESS` marks completion), then delete + rename.
    * [[readStateSafe]] falls back to a COMPLETE staging dir, so every
    * crash window leaves a readable full state:
    *  - crash during staging write → main intact, staging has no _SUCCESS;
    *  - crash between delete and rename → staging complete, fallback reads it;
    *  - rename is an atomic dir move on HDFS/local (not on S3A — there,
    *    point `path` at a metadata-consistent store or use a manifest).
    */
  def writeStateAtomic(state: DataFrame, path: String): Unit = {
    val spark = state.sparkSession
    val staging = path + ".staging"
    state.write.mode("overwrite").parquet(staging)
    val (hfs, p) = fs(spark, path)
    val sp = new org.apache.hadoop.fs.Path(staging)
    if (hfs.exists(p)) hfs.delete(p, true)
    hfs.rename(sp, p)
  }

  /** [[readState]] with the staging fallback of [[writeStateAtomic]]. */
  def readStateSafe(spark: SparkSession, path: String): Option[DataFrame] = {
    val (hfs, p) = fs(spark, path)
    val sp = new org.apache.hadoop.fs.Path(path + ".staging")
    val success = new org.apache.hadoop.fs.Path(path + ".staging/_SUCCESS")
    if (hfs.exists(p)) Some(spark.read.parquet(path))
    else if (hfs.exists(success)) Some(spark.read.parquet(sp.toString))
    else None
  }

  /** Bucketed edge-state table: hash-bucketed AND sorted on the merge
    * key, so the recurring incremental merge (a full-outer join on
    * (src, dst) every batch) reads both sides pre-partitioned — no
    * shuffle of the accumulated state, which at 100 TB dwarfs each
    * increment. PipelinesSpec asserts the bucketed self-merge plans
    * with zero exchanges.
    */
  def writeStateBucketed(state: DataFrame, table: String, buckets: Int): Unit =
    state.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, "src", "dst")
      .sortBy("src", "dst")
      .saveAsTable(table)

  def readStateTable(spark: SparkSession, table: String): Option[DataFrame] =
    if (spark.catalog.tableExists(table)) Some(spark.table(table)) else None

  /** §3.3 `query` — k-hop team expansion (k=2 in the reference DQL);
    * [[GraphOps.kHop]] checkpoints frontier lineage internally for
    * large k.
    */
  def hopQuery(edges: DataFrame, teamMembers: DataFrame, teamId: String, k: Int = 2): DataFrame = {
    val seeds = teamMembers.filter(col("team_id") === teamId).select(col("person_id"))
    GraphOps.kHop(edges, seeds, k)
  }

  /** The reference `query` binary's nested RESPONSE SHAPE
    * (cmd/query/main.go:29-50): the DQL engine returns one JSON
    * document with `hop1_count` — each first-hop person with its
    * filtered `has_connection` expansion — and `hop2_count`, the flat
    * second-hop person list. [[hopQuery]] computes the same reachable
    * sets as relational rows (the oracle-verified form, `j4_two_hop`);
    * this wraps them into the response document: one row, one `json`
    * column, arrays sorted by `person_id` so the string is
    * deterministic (Dgraph orders by uid; person_id is this engine's
    * vertex key).
    *
    * Filters mirror the DQL exactly: hop1 = connections of the team's
    * members minus the members; hop2 = connections of hop1 minus hop1
    * minus the members. Hop-1 persons whose expansion filtered to
    * nothing keep an empty `has_connection` array (explicit, where
    * Dgraph would drop the field).
    *
    * Scale note: the per-person `collect_list` is degree-bounded, but
    * the final document is a single JSON value — a query RESPONSE
    * (exactly what the reference prints as `resp.Json`), not a corpus
    * operator; use [[hopQuery]]'s rows for anything downstream.
    */
  def hopQueryJson(edges: DataFrame, teamMembers: DataFrame, teamId: String): DataFrame = {
    val src = teamMembers.filter(col("team_id") === teamId)
      .select(col("person_id")).distinct()
    val e = edges.select(col("src"), col("dst"))
    val hop1 = e.join(src, e("src") === src("person_id"))
      .select(e("dst").as("person_id")).distinct()
      .join(src, Seq("person_id"), "left_anti")
    val h2edges = e.join(hop1, e("src") === hop1("person_id"))
      .select(e("src").as("h1"), e("dst").as("person_id"))
      .distinct()
      .join(hop1, Seq("person_id"), "left_anti")
      .join(src, Seq("person_id"), "left_anti")
    val hop1Rows = hop1.select(col("person_id").as("h1"))
      .join(h2edges, Seq("h1"), "left_outer")
      .groupBy(col("h1"))
      // collect_list skips nulls, so connection-less hop-1 persons
      // keep an explicit empty array through the left join
      .agg(array_sort(collect_list(
        when(col("person_id").isNotNull, struct(col("person_id")))))
        .as("has_connection"))
    val h1arr = hop1Rows
      .agg(array_sort(collect_list(
        struct(col("h1").as("person_id"), col("has_connection"))))
        .as("hop1_count"))
    val h2arr = h2edges.select(col("person_id")).distinct()
      .agg(array_sort(collect_list(struct(col("person_id")))).as("hop2_count"))
    h1arr.crossJoin(h2arr)
      .select(to_json(struct(col("hop1_count"), col("hop2_count"))).as("json"))
  }
}
