package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the document-dedup surface: the continuous-ingest
  * form of [[graft.operators.Dedup.exactDedup]] /
  * [[graft.operators.Dedup.incrementalNew]] — a crawl stream where each
  * distinct content must be admitted exactly once, on first sight.
  *
  * State is keyed by the same double-hash + length content key as the
  * batch operators (24 bytes per distinct document ever seen — exactly
  * the persisted corpus-key table of `incrementalNew`, held in the
  * state store instead of parquet). The document body itself never
  * enters the state store.
  *
  * The reference's analog is the unbounded in-memory `uMap` first-
  * sighting cache (cmd/bulk/main.go:29-53, with its check-then-set
  * race); here the state store is exact, partitioned, and
  * checkpoint-recoverable. For event-time-bounded retention (dedup only
  * within a horizon), use `withWatermark` upstream +
  * `dropDuplicatesWithinWatermark` — with an unbounded key universe the
  * bounded-state form is the 100 TB default; the unbounded form below
  * matches the batch operators' whole-corpus semantics.
  */
object DocStreams {

  /** Emit each distinct content exactly once (first arrival wins —
    * under an id-ordered replay this equals the batch `exactDedup`
    * min-id canonical choice). Works on a static frame too: batch
    * execution degenerates to `dropDuplicates` on the content key.
    */
  def firstSeenDedup(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("__h", xxhash64(col(textCol)))
      .withColumn("__h2", xxhash64(lit(42L), col(textCol)))
      .withColumn("__glen", length(col(textCol)).cast("long"))
      .dropDuplicates("__h", "__h2", "__glen")
      .drop("__h", "__h2", "__glen")

  /** Stream-static blocklist filter: drop stream documents whose
    * content matches a static blocklist (takedown lists, eval-set
    * exclusion) — a stateless stream-static left-anti join on the
    * content key, with the (small) blocklist key set broadcast to every
    * micro-batch. The static side is re-read per batch, so a blocklist
    * update lands without restarting the query; neither side's text
    * crosses the join.
    */
  def blocklistFilter(
      stream: DataFrame,
      blocklist: DataFrame,
      textCol: String = "text"): DataFrame = {
    val keys = blocklist.select(
      xxhash64(col(textCol)).as("__h"),
      xxhash64(lit(42L), col(textCol)).as("__h2"),
      length(col(textCol)).cast("long").as("__glen"))
    stream
      .withColumn("__h", xxhash64(col(textCol)))
      .withColumn("__h2", xxhash64(lit(42L), col(textCol)))
      .withColumn("__glen", length(col(textCol)).cast("long"))
      .join(broadcast(keys), Seq("__h", "__h2", "__glen"), "left_anti")
      .drop("__h", "__h2", "__glen")
  }
}
