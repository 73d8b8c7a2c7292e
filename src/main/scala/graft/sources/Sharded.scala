package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Production shape of the reference's sharded MySQL `user` source
  * (SURVEY §2.1 S2–S4): two range-sharded databases whose key spans the
  * full uint64 range — shard 1 = [0, 2^63−1], shard 2 = [2^63, 2^64−1]
  * (reference cmd/bulk/main.go:231-249).
  *
  * The reference routes per row through a `big.Int` comparison; here a
  * shard is one logical JDBC table read with `predicates` (one
  * partition per key sub-range — Spark issues one query per predicate)
  * and shards union into a single DataFrame. Range routing becomes
  * partition pruning; the per-row probe (S2) becomes the J2 semi-join.
  *
  * uint64 discipline: ids are NEVER cast to long (2^64−1 overflows);
  * predicates compare as DECIMAL(20,0).
  */
object Sharded {

  final case class Shard(url: String, table: String, lo: BigInt, hi: BigInt)

  /** The reference's two-shard layout for a given pair of URLs. */
  def referenceShards(urlOne: String, urlTwo: String, table: String = "user"): Seq[Shard] = Seq(
    Shard(urlOne, table, BigInt(0), BigInt(2).pow(63) - 1),
    Shard(urlTwo, table, BigInt(2).pow(63), BigInt(2).pow(64) - 1))

  /** Split a shard's [lo, hi] key range into `n` contiguous JDBC
    * partition predicates over a DECIMAL(20,0) key column. Inclusive
    * bounds, no gaps, no overlap — proven by SharededSpec.
    */
  def rangePredicates(keyCol: String, lo: BigInt, hi: BigInt, n: Int): Array[String] = {
    require(n >= 1 && hi >= lo)
    val span = hi - lo + 1
    val step = span / n
    val rem = span % n
    val bounds = (0 to n).map(i => lo + step * i + rem.min(i))
    (0 until n).map { i =>
      val l = bounds(i)
      val h = bounds(i + 1) - 1
      // compare the RAW column against decimal literals — wrapping the
      // column in CAST(...) would defeat the database's key index and
      // turn every partition read into a full table scan; bare
      // comparisons let MySQL range-scan BIGINT UNSIGNED keys directly
      s"$keyCol >= $l AND $keyCol <= $h"
    }.toArray
  }

  /** Read every shard with `partitionsPerShard` range-partitioned
    * queries and union them — the set-oriented replacement for the
    * reference's row-at-a-time shard router + point probe.
    */
  def readSharded(
      spark: SparkSession,
      shards: Seq[Shard],
      keyCol: String,
      partitionsPerShard: Int,
      props: Properties): DataFrame = {
    require(shards.nonEmpty, "readSharded: empty shard list (misconfigured source?)")
    shards.map { sh =>
      spark.read.jdbc(
        sh.url, sh.table,
        rangePredicates(keyCol, sh.lo, sh.hi, partitionsPerShard),
        props)
    }.reduce(_ unionByName _)
  }
}
