package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.model.Edge
import graft.operators.GraphOps
import graft.pipelines.Pipelines

/** Streaming form of the reference's `etl` binary (SURVEY §3.1): an
  * incremental doc stream → directed scored edges → stateful
  * upsert-if-greater per edge key.
  *
  * The reference does this row-at-a-time against Dgraph with read-txn +
  * conditional-write + retry-on-conflict (dgraph.go:110-223); here the
  * max-merge state lives in Spark's state store keyed by (src, dst) and
  * emissions are exactly the reference's *intended* semantics: emit an
  * edge iff its running max increased (monotone updates, last emission
  * per key = groupBy-max).
  */
object EdgeStreams {

  /** Doc stream → 2 directed edges per doc (stateless; same projection
    * as the batch [[graft.operators.GraphOps.edgesFromDocs]]).
    */
  def edgesFromDocStream(docs: DataFrame): Dataset[Edge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.operators.GraphOps.edgesFromDocs(docs).as[Edge]
  }

  /** T3 — stateful upsert-if-greater: per (src, dst) keep the running
    * max score; emit only strict increases (OutputMode.Update). State
    * is one double per live edge key.
    *
    * In batch execution the same call degenerates to per-key max with
    * empty initial state — one code path, two engines.
    */
  def upsertIfGreater(edges: Dataset[Edge]): Dataset[Edge] = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges
      .groupByKey(e => (e.src, e.dst))
      .flatMapGroupsWithState[Double, Edge](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case ((src, dst), rows, state: GroupState[Double]) =>
          var best = state.getOption.getOrElse(Double.NegativeInfinity)
          var emit = false
          rows.foreach { e =>
            if (e.score > best) { best = e.score; emit = true }
          }
          if (emit) {
            state.update(best)
            Iterator(Edge(src, dst, best))
          } else Iterator.empty
      }
  }

  /** The full incremental ETL loop as a file-driven stream: watch a
    * directory of relationship-doc parquet, per micro-batch explode to
    * edges, max-merge the batch, and MERGE into the persistent parquet
    * edge state (conflict-free full-outer + greatest — the semantics
    * the reference implements with per-row transactions and retry
    * loops, dgraph.go:53-223).
    *
    * `Trigger.AvailableNow` drains everything present then stops —
    * the batch-incremental cadence; a `ProcessingTime` trigger turns
    * the same code into a continuous pipeline. Source offsets live in
    * the checkpoint, replacing the reference's hand-logged watermark.
    *
    * `cutDir` (durable in-batch lineage cut, see
    * [[graft.operators.Checkpoints.cut]]): each micro-batch writes NEW
    * reliable-checkpoint files and Spark's cleaner
    * (`spark.cleaner.referenceTracking.cleanCheckpoints=true`) deletes
    * old ones only best-effort on RDD GC — a long-running
    * `ProcessingTime` stream can grow the dir without bound. Run
    * long-lived streams with the cleaner enabled and monitor the dir,
    * or prefer the default `localCheckpoint` mode (the streaming
    * checkpoint + atomic state write already bound replay to one
    * batch). `AvailableNow` drains are naturally bounded.
    */
  def runFileEtl(
      spark: SparkSession,
      inDir: String,
      docSchema: StructType,
      stateDir: String,
      checkpointDir: String,
      cutDir: Option[String] = None): StreamingQuery = {
    val docs = spark.readStream.schema(docSchema).parquet(inDir)
    val mergeBatch: (Dataset[Edge], Long) => Unit = { (batch, _) =>
      val merged = GraphOps.mergeMaxEdges(batch.toDF())
      // readStateSafe + writeStateAtomic: a crash in any window leaves a
      // complete readable state (main or _SUCCESS-marked staging) — a
      // plain overwrite would destroy the accumulated max-merge state if
      // the job died mid-write, which the streaming checkpoint cannot
      // replay (it only re-runs the in-flight batch)
      // materialize BEFORE overwriting the state we just read from
      // (durable under Some(cutDir) — see Checkpoints.cut)
      val next = graft.operators.Checkpoints.cut(
        Pipelines.readStateSafe(batch.sparkSession, stateDir)
          .fold(merged)(GraphOps.mergeEdgeStates(_, merged)),
        cutDir)
      Pipelines.writeStateAtomic(next, stateDir)
    }
    edgesFromDocStream(docs)
      .writeStream
      .foreachBatch(mergeBatch)
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
