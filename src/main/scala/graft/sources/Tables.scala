package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Fixture readers + the deterministic derivation of the reference's
  * input shapes from the driver's TPC-H-ish parquet tables.
  *
  * The reference consumes three inputs (SURVEY §1.2): an Elasticsearch
  * `user_relationship` doc stream, a range-sharded MySQL `user` table,
  * and a MySQL `team_member` table. The driver's correctness harness is
  * parquet-based, so we derive equivalently-shaped DataFrames from the
  * relational fixtures with a derivation that is pure ANSI SQL — the
  * DuckDB oracle reproduces it verbatim (see SparkEntry.OracleFragments).
  *
  * Person-id keyspace: customers are `C<custkey>`, suppliers are
  * `S<suppkey>` — prefixes keep the two numeric keyspaces disjoint and
  * exercise the reference's string-id discipline (ids must never be
  * cast to long; reference cmd/bulk/main.go:248-249 uses uint64-range
  * ids).
  */
object Tables {

  /** Read one fixture table. Predicate pushdown and column pruning into
    * the parquet scan are Catalyst's job — callers just compose.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  /** `events.ts` has shipped under two parquet encodings across fixture
    * generations, so the load branches on the column's loaded type:
    *
    *  - `timestamp[us]` (current fixtures): pyarrow writes it without
    *    `isAdjustedToUTC`, which Spark reads as TIMESTAMP_NTZ. Cast to
    *    TimestampType under the UTC session convention (Verify pins
    *    `spark.sql.session.timeZone=UTC`) — DuckDB's naive TIMESTAMP of
    *    the same file then compares exactly. A UTC-adjusted file loads
    *    as TimestampType directly and passes through.
    *  - `TIMESTAMP(NANOS)` (earlier fixtures): Spark's reader rejects it
    *    outright, so with `nanosAsLong` it loads as nanos-since-epoch
    *    LongType; rebuild a microsecond TimestampType — integer `div`,
    *    not `/`: epoch-nanos ≈ 1.7e18 exceeds double's 2^53 mantissa, so
    *    float division would corrupt low bits. µs truncation matches
    *    DuckDB's TIMESTAMP of the same file.
    *
    * Any other type is a new fixture drift — fail loudly rather than
    * let 20 downstream oracle queries mis-analyze (round-9 lesson).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case TimestampType    => raw
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case other => throw new IllegalStateException(
        s"events.ts loaded as unsupported type $other; expected " +
          "timestamp, timestamp_ntz, or int64 nanos — fixture drift?")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** The ES `user_relationship` analogue (reference elastic.go:13-23):
    * one row per interaction with directional raw scores.
    *
    * Derivation: `orders ⋈ lineitem` — each lineitem is one
    * customer↔supplier interaction. `last_update` = `l_shipdate` (the
    * watermark column), scores are small deterministic ints.
    *
    * Scale note: this is a plain equi-join on `o_orderkey`/`l_orderkey`;
    * at 100 TB both sides are large so Spark picks sort-merge join with
    * AQE. No driver-side state.
    */
  def relationshipDocs(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .join(orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .select(
        col("l_shipdate").as("last_update"),
        concat(lit("C"), col("o_custkey").cast("string")).as("from_person_id"),
        concat(lit("S"), col("l_suppkey").cast("string")).as("to_person_id"),
        struct(
          col("l_quantity").cast("int").as("raw_score_in"),
          (col("l_partkey") % 100).cast("int").as("raw_score_out")
        ).as("stats"))

  /** The sharded MySQL `user` table analogue (reference mysql.go:17-57):
    * the set of person ids that exist in the "trove" user store.
    * Membership rule: customers with positive account balance.
    */
  def troveUsers(spark: SparkSession, dir: String): DataFrame =
    customer(spark, dir)
      .filter(col("c_acctbal") > 0)
      .select(concat(lit("C"), col("c_custkey").cast("string")).as("person_id_user"))

  /** The MySQL `team_member` analogue (reference mysql.go:59-82):
    * team = nation, members = that nation's customers.
    */
  def teamMembers(spark: SparkSession, dir: String): DataFrame =
    customer(spark, dir)
      .select(
        concat(lit("N"), col("c_nationkey").cast("string")).as("team_id"),
        concat(lit("C"), col("c_custkey").cast("string")).as("person_id"))
}
