package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data shard export — the terminal stage of a curation
  * pipeline: the corpus as `n` size-balanced parquet shards, each
  * internally sorted, optionally split into train/val/test
  * subdirectories.
  *
  * Scale design:
  *  - Balance comes from hash-partitioning on a key column (stable,
  *    content-addressed) — NOT `repartition(n)` round-robin, whose
  *    assignment depends on the input partition layout and so is not
  *    rerun-stable; and NOT a global `orderBy`, whose range exchange
  *    adds a sampling pass and a full sort.
  *  - Per-shard order via `sortWithinPartitions` — an in-partition
  *    sort with NO exchange, so the plan is exactly one hash shuffle.
  *  - Readers that want deterministic global order read shards in
  *    filename order; within a shard rows are already sorted.
  */
object Shards {

  /** One shard set: `path/part-*` parquet, `n` files, hash(keyCol)
    * balanced, each sorted by `sortCols` (defaults to the key).
    */
  def writeShards(
      df: DataFrame,
      path: String,
      n: Int,
      keyCol: String,
      sortCols: Seq[String] = Nil): Unit = {
    require(n > 0, s"shard count must be positive, got $n")
    val sorts = if (sortCols.nonEmpty) sortCols else Seq(keyCol)
    df.repartition(n, col(keyCol))
      .sortWithinPartitions(sorts.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Split-aware export: `path/split=<v>/part-*` via parquet partition
    * columns — each split is its own directory subtree, readable alone
    * (`spark.read.parquet(s"$path/split=train")`) or together (the
    * split column comes back via partition discovery).
    */
  def writeSplitShards(
      df: DataFrame,
      path: String,
      n: Int,
      keyCol: String,
      splitCol: String = "split"): Unit = {
    require(n > 0, s"shard count must be positive, got $n")
    df.repartition(n, col(keyCol))
      .sortWithinPartitions(col(keyCol))
      .write.mode("overwrite")
      .partitionBy(splitCol)
      .parquet(path)
  }

  def readShards(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
