package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.GraphOps
import graft.sinks.Rdf
import graft.sources.Tables

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (+ the extended LLM-pipeline surface), each with a
  * DuckDB-equivalent `oracleSql`.
  *
  * Oracle discipline (why every numeric output is BIGINT / exact):
  * the driver hash-compares Spark parquet output against DuckDB output.
  * Cross-engine floating-point aggregation order differs, so any
  * double-typed *aggregate* would be a flaky hash. All money/score
  * aggregates are therefore quantized per-row with `floor(x*K + 0.5)`
  * (identical IEEE arithmetic in both engines — the per-row double
  * expression is order-free) and summed as exact BIGINTs. Column names
  * are aliased identically on both sides; the driver sorts columns by
  * name before hashing.
  */
object SparkEntry {

  // ---------------------------------------------------------------------------
  // Shared oracle fragments — the SQL twin of graft.sources.Tables.
  // ---------------------------------------------------------------------------

  /** SQL twin of [[Tables.relationshipDocs]] (flattened stats). */
  private val DOCS =
    """docs AS (
      |  SELECT l_shipdate AS last_update,
      |         'C' || CAST(o_custkey AS VARCHAR) AS from_person_id,
      |         'S' || CAST(l_suppkey AS VARCHAR) AS to_person_id,
      |         CAST(l_quantity AS INT) AS raw_score_in,
      |         CAST(l_partkey % 100 AS INT) AS raw_score_out
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)""".stripMargin

  /** SQL twin of [[GraphOps.edgesFromDocs]]. */
  private val EDGES =
    s"""$DOCS,
       |edges AS (
       |  SELECT from_person_id AS src, to_person_id AS dst,
       |         CAST(raw_score_in AS DOUBLE) AS score FROM docs
       |  UNION ALL
       |  SELECT to_person_id AS src, from_person_id AS dst,
       |         CAST(raw_score_out AS DOUBLE) AS score FROM docs)""".stripMargin

  /** SQL twin of [[GraphOps.mergeMaxEdges]]. */
  private val MERGED =
    s"""$EDGES,
       |merged AS (
       |  SELECT src, dst, MAX(score) AS score FROM edges GROUP BY src, dst)""".stripMargin

  /** SQL twin of [[Tables.troveUsers]]. */
  private val USERS =
    """users AS (
      |  SELECT 'C' || CAST(c_custkey AS VARCHAR) AS person_id_user
      |  FROM customer WHERE c_acctbal > 0)""".stripMargin

  /** SQL twin of [[Tables.teamMembers]]. */
  private val TEAMS =
    """team_members AS (
      |  SELECT 'N' || CAST(c_nationkey AS VARCHAR) AS team_id,
      |         'C' || CAST(c_custkey AS VARCHAR) AS person_id
      |  FROM customer)""".stripMargin

  private val WATERMARK = "1995-06-01 00:00:00"

  // Spark-side shared builders -------------------------------------------------

  private def docsOf(s: SparkSession, dir: String): DataFrame = Tables.relationshipDocs(s, dir)
  private def edgesOf(s: SparkSession, dir: String): DataFrame = GraphOps.edgesFromDocs(docsOf(s, dir))
  private def mergedOf(s: SparkSession, dir: String): DataFrame = GraphOps.mergeMaxEdges(edgesOf(s, dir))

  /** Exact money quantization — identical IEEE expression in DuckDB. */
  private def e2(c: org.apache.spark.sql.Column) = floor(c * 100 + 0.5).cast("long")

  // ---------------------------------------------------------------------------
  // Flagship
  // ---------------------------------------------------------------------------

  /** Flagship: the reference's `query` binary (2-hop team expansion,
    * cmd/query/main.go:29-43) on sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("j4_two_hop")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------------------
  // Queries
  // ---------------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1+P1+T1: watermark-filtered incremental scan (predicate pushes to parquet)
    "s1_watermark_scan" -> ((s, dir) => {
      GraphOps.watermarkFilter(docsOf(s, dir), java.sql.Timestamp.valueOf(WATERMARK))
        .select(
          unix_timestamp(col("last_update")).as("last_update_s"),
          col("from_person_id"), col("to_person_id"),
          col("stats.raw_score_in").as("raw_score_in"),
          col("stats.raw_score_out").as("raw_score_out"))
    }),

    // P3: numeric-parse id filter (keep string ids; uint64-safe)
    "p3_numeric_filter" -> ((s, dir) => {
      val raw = Tables.customer(s, dir).select(
        when(col("c_custkey") % 7 === 0, col("c_name"))
          .otherwise(col("c_custkey").cast("string")).as("person_id_raw"))
      GraphOps.numericIdFilter(raw, "person_id_raw")
    }),

    // P4+U1: doc → two directed edges (explode, no shuffle)
    "p4_explode_edges" -> ((s, dir) => edgesOf(s, dir)),

    // A2: grouped max — the reference's core merge semantics
    "a2_merge_max" -> ((s, dir) => mergedOf(s, dir)),

    // A3: group-into-list (sorted for determinism) + member count
    "a3_team_groups" -> ((s, dir) => {
      GraphOps.groupTeamMembers(Tables.teamMembers(s, dir))
        .select(
          col("team_id"),
          size(col("members")).cast("long").as("n_members"),
          concat_ws(",", col("members")).as("members_csv"))
    }),

    // A4+J1: distinct vertex set of the edge list
    "a4_distinct_persons" -> ((s, dir) => GraphOps.distinctPersons(edgesOf(s, dir))),

    // J2 (+S2+S4): existence semi-join → boolean is_trove_user flag
    "j2_trove_flags" -> ((s, dir) => {
      GraphOps.markTroveUsers(
        GraphOps.distinctPersons(edgesOf(s, dir)),
        Tables.troveUsers(s, dir))
    }),

    // J3: incremental MERGE (full-outer + greatest) of old vs new edge state
    "j3_incremental_merge" -> ((s, dir) => {
      val docs = docsOf(s, dir)
      val wm = java.sql.Timestamp.valueOf(WATERMARK)
      val old = GraphOps.mergeMaxEdges(GraphOps.edgesFromDocs(
        docs.filter(col("last_update") < lit(wm))))
      val nw = GraphOps.mergeMaxEdges(GraphOps.edgesFromDocs(
        docs.filter(col("last_update") >= lit(wm))))
      GraphOps.mergeEdgeStates(old, nw)
    }),

    // J4+U2: 2-hop team expansion with per-hop exclusion
    "j4_two_hop" -> ((s, dir) => {
      val seeds = Tables.teamMembers(s, dir)
        .filter(col("team_id") === "N1").select(col("person_id"))
      GraphOps.kHop(mergedOf(s, dir), seeds, 2)
    }),

    // U2: except (anti + distinct) — persons that are not trove users
    "u2_except_non_trove" -> ((s, dir) => {
      GraphOps.distinctPersons(edgesOf(s, dir))
        .except(Tables.troveUsers(s, dir)
          .select(col("person_id_user").as("person_id")))
    }),

    // S6+P5: RDF edge triples, byte-format pinned to the reference
    "s6_rdf_edges" -> ((s, dir) => Rdf.edgeTriples(mergedOf(s, dir))),

    // S6: person triples incl. typed boolean literal
    "s6_rdf_persons" -> ((s, dir) => {
      Rdf.personTriples(GraphOps.markTroveUsers(
        GraphOps.distinctPersons(edgesOf(s, dir)),
        Tables.troveUsers(s, dir)))
    }),

    // O: global top-k with deterministic tiebreak (TakeOrderedAndProject)
    "o_topk_edges" -> ((s, dir) => {
      mergedOf(s, dir)
        .orderBy(col("score").desc, col("src").asc, col("dst").asc)
        .limit(20)
    }),

    // Relational agg: TPC-H Q1-shaped pricing summary, exact cents
    "q1_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(e2(col("l_extendedprice"))).as("sum_base_cents"),
          sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000 + 0.5)
            .cast("long")).as("sum_disc_e4"),
          count(lit(1)).as("n_rows"))
    }),

    // Relational join + agg + top-k: Q3-shaped revenue per order
    "q3_topk_revenue" -> ((s, dir) => {
      Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000 + 0.5)
          .cast("long")).as("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // Window: top-2 customers per nation by balance (deterministic tiebreak)
    "w_rank_per_nation" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables.customer(s, dir)
        .select(
          col("c_nationkey"), col("c_custkey"),
          e2(col("c_acctbal")).as("acctbal_cents"),
          row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= 2)
    }),

    // Distinct aggregate
    "agg_count_distinct" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_suppkey")).as("n_supps"))
    })
  )

  // ---------------------------------------------------------------------------
  // Oracles — DuckDB ANSI SQL over the same parquet tables
  // ---------------------------------------------------------------------------

  def oracleSql: Map[String, String] = Map(
    "s1_watermark_scan" ->
      s"""WITH $DOCS
         |SELECT CAST(floor(epoch(last_update)) AS BIGINT) AS last_update_s,
         |       from_person_id, to_person_id, raw_score_in, raw_score_out
         |FROM docs WHERE last_update >= TIMESTAMP '$WATERMARK'""".stripMargin,

    "p3_numeric_filter" ->
      """WITH raw AS (
        |  SELECT CASE WHEN c_custkey % 7 = 0 THEN c_name
        |              ELSE CAST(c_custkey AS VARCHAR) END AS person_id_raw
        |  FROM customer)
        |SELECT person_id_raw FROM raw
        |WHERE regexp_full_match(person_id_raw, '^[0-9]+$')""".stripMargin,

    "p4_explode_edges" ->
      s"""WITH $EDGES
         |SELECT src, dst, score FROM edges""".stripMargin,

    "a2_merge_max" ->
      s"""WITH $MERGED
         |SELECT src, dst, score FROM merged""".stripMargin,

    "a3_team_groups" ->
      s"""WITH $TEAMS
         |SELECT team_id,
         |       CAST(COUNT(*) AS BIGINT) AS n_members,
         |       string_agg(person_id, ',' ORDER BY person_id) AS members_csv
         |FROM team_members GROUP BY team_id""".stripMargin,

    "a4_distinct_persons" ->
      s"""WITH $EDGES
         |SELECT DISTINCT person_id FROM (
         |  SELECT src AS person_id FROM edges
         |  UNION ALL SELECT dst FROM edges)""".stripMargin,

    "j2_trove_flags" ->
      s"""WITH $EDGES, $USERS,
         |persons AS (
         |  SELECT DISTINCT person_id FROM (
         |    SELECT src AS person_id FROM edges
         |    UNION ALL SELECT dst FROM edges))
         |SELECT p.person_id,
         |       (u.person_id_user IS NOT NULL) AS is_trove_user
         |FROM persons p
         |LEFT JOIN (SELECT DISTINCT person_id_user FROM users) u
         |  ON p.person_id = u.person_id_user""".stripMargin,

    "j3_incremental_merge" ->
      s"""WITH $DOCS,
         |old_edges AS (
         |  SELECT from_person_id AS src, to_person_id AS dst,
         |         CAST(raw_score_in AS DOUBLE) AS score FROM docs
         |  WHERE last_update < TIMESTAMP '$WATERMARK'
         |  UNION ALL
         |  SELECT to_person_id, from_person_id, CAST(raw_score_out AS DOUBLE)
         |  FROM docs WHERE last_update < TIMESTAMP '$WATERMARK'),
         |new_edges AS (
         |  SELECT from_person_id AS src, to_person_id AS dst,
         |         CAST(raw_score_in AS DOUBLE) AS score FROM docs
         |  WHERE last_update >= TIMESTAMP '$WATERMARK'
         |  UNION ALL
         |  SELECT to_person_id, from_person_id, CAST(raw_score_out AS DOUBLE)
         |  FROM docs WHERE last_update >= TIMESTAMP '$WATERMARK'),
         |old_m AS (SELECT src, dst, MAX(score) AS score FROM old_edges GROUP BY src, dst),
         |new_m AS (SELECT src, dst, MAX(score) AS score FROM new_edges GROUP BY src, dst)
         |SELECT COALESCE(o.src, n.src) AS src,
         |       COALESCE(o.dst, n.dst) AS dst,
         |       GREATEST(COALESCE(o.score, n.score), COALESCE(n.score, o.score)) AS score
         |FROM old_m o FULL OUTER JOIN new_m n
         |  ON o.src = n.src AND o.dst = n.dst""".stripMargin,

    "j4_two_hop" ->
      s"""WITH $MERGED, $TEAMS,
         |members AS (SELECT person_id FROM team_members WHERE team_id = 'N1'),
         |hop1 AS (
         |  SELECT DISTINCT e.dst AS person_id
         |  FROM merged e JOIN members m ON e.src = m.person_id
         |  EXCEPT SELECT person_id FROM members),
         |hop2 AS (
         |  SELECT DISTINCT e.dst AS person_id
         |  FROM merged e JOIN hop1 h ON e.src = h.person_id
         |  EXCEPT SELECT person_id FROM hop1
         |  EXCEPT SELECT person_id FROM members)
         |SELECT person_id FROM hop2""".stripMargin,

    "u2_except_non_trove" ->
      s"""WITH $EDGES, $USERS
         |SELECT DISTINCT person_id FROM (
         |  SELECT src AS person_id FROM edges
         |  UNION ALL SELECT dst FROM edges)
         |EXCEPT SELECT person_id_user FROM users""".stripMargin,

    "s6_rdf_edges" ->
      s"""WITH $MERGED
         |SELECT '_:' || src || ' <has_connection> _:' || dst ||
         |       ' (score=' || CAST(CAST(score AS BIGINT) AS VARCHAR) || ') .'
         |       AS triple
         |FROM merged""".stripMargin,

    "s6_rdf_persons" ->
      s"""WITH $EDGES, $USERS,
         |persons AS (
         |  SELECT p.person_id,
         |         (u.person_id_user IS NOT NULL) AS is_trove_user
         |  FROM (SELECT DISTINCT person_id FROM (
         |          SELECT src AS person_id FROM edges
         |          UNION ALL SELECT dst FROM edges)) p
         |  LEFT JOIN (SELECT DISTINCT person_id_user FROM users) u
         |    ON p.person_id = u.person_id_user)
         |SELECT triple FROM (
         |  SELECT '_:' || person_id || ' <person_id> "' || person_id || '" .' AS triple
         |  FROM persons
         |  UNION ALL
         |  SELECT '_:' || person_id || ' <is_trove_user> "' ||
         |         CASE WHEN is_trove_user THEN 'true' ELSE 'false' END ||
         |         '"^^<xs:boolean> .'
         |  FROM persons)""".stripMargin,

    "o_topk_edges" ->
      s"""WITH $MERGED
         |SELECT src, dst, score FROM merged
         |ORDER BY score DESC, src ASC, dst ASC LIMIT 20""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |         AS sum_base_cents,
        |       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT)
        |         AS sum_disc_e4,
        |       COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_topk_revenue" ->
      """SELECT l_orderkey,
        |       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT)
        |         AS revenue_e4
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey
        |ORDER BY revenue_e4 DESC, l_orderkey ASC LIMIT 10""".stripMargin,

    "w_rank_per_nation" ->
      """SELECT c_nationkey, c_custkey, acctbal_cents, rn FROM (
        |  SELECT c_nationkey, c_custkey,
        |         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents,
        |         CAST(row_number() OVER (
        |           PARTITION BY c_nationkey
        |           ORDER BY c_acctbal DESC, c_custkey ASC) AS BIGINT) AS rn
        |  FROM customer)
        |WHERE rn <= 2""".stripMargin,

    "agg_count_distinct" ->
      """SELECT l_returnflag,
        |       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        |       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps
        |FROM lineitem GROUP BY l_returnflag""".stripMargin
  )
}
