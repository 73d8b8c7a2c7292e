package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.Edge

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
}
