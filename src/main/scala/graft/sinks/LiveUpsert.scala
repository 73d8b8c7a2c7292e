package graft.sinks

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** A connection to a live graph store, opened once per partition.
  * `upsertIfGreater` must atomically apply
  * `state(src,dst) := max(state(src,dst), score)`, creating the edge
  * if absent — the set-oriented contract distilled from the
  * reference's find → create-if-absent → update-only-if-score-greater
  * transaction (dgraph.go:110-132 `CreateOrUpdateRelationship`,
  * 175-223 `createRelationship`/`UpdateRelationship`).
  */
trait LiveGraphStore extends AutoCloseable {
  def upsertIfGreater(src: String, dst: String, score: Double): Unit
}

/** Serializable factory shipped to executors; `open` is called once
  * per partition (≈ one store connection per task, the batched
  * replacement for the reference's per-row client calls).
  */
trait LiveGraphStoreFactory extends Serializable {
  def open(partitionId: Int): LiveGraphStore
}

/** Live graph-upsert sink — the executable Spark twin of the
  * reference `etl` binary's transactional path, for the "live
  * cluster, can't bulk-load" case that [[graft.pipelines.Pipelines]]'s
  * pre-merged parquet state does not serve.
  *
  * Why no retry/backoff tier (dgraph.go:85-108): max is commutative,
  * associative, and idempotent, so a replayed or speculative task
  * re-applies the same maxima and converges to the same store state —
  * Spark's own task retry is sufficient. The reference needs
  * app-level retries because its read-modify-write spans two
  * transactions; `upsertIfGreater` pushes that atomicity into the
  * store call.
  *
  * Scale shape: the batch is pre-merged to one row per key
  * ([[GraphOps.mergeMaxEdges]] — map-side combine), then
  * hash-partitioned on the key so each key reaches exactly ONE store
  * connection per batch (no cross-task write conflicts), versus the
  * reference's one find + one mutate per input ROW.
  */
object LiveUpsert {

  def writeUpserts(edges: DataFrame, store: LiveGraphStoreFactory): Unit = {
    val merged = GraphOps.mergeMaxEdges(edges)
      .repartition(col("src"), col("dst"))
    merged.foreachPartition { rows: Iterator[Row] =>
      val conn = store.open(TaskContext.getPartitionId())
      try rows.foreach { r =>
        conn.upsertIfGreater(
          r.getAs[String]("src"), r.getAs[String]("dst"), r.getAs[Double]("score"))
      } finally conn.close()
    }
  }
}
