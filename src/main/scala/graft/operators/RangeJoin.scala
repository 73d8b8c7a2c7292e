package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-containment (range) join — with the as-of join, the second
  * member of the inequality-join family the reference lacks (SURVEY
  * §2.3 "absent" row) and Spark has no native operator for: Catalyst
  * plans a raw `p BETWEEN s AND e` join as BroadcastNestedLoop or a
  * cross product.
  *
  * Scale shape: a bucket-replicated equi-join. Every interval is
  * exploded to the `bucketWidth`-aligned buckets it covers; every point
  * maps to its single bucket; the join is a plain hash equi-join on the
  * bucket with the containment predicate verified inline. Each
  * (point, interval) pair meets in EXACTLY one bucket — the point's —
  * so the output needs no dedup. Cost model: interval replication
  * factor = avg(len)/bucketWidth + 1, point side unreplicated; pick
  * `bucketWidth` ≈ the typical interval length so replication stays
  * O(1) while buckets stay selective. Skewed hot buckets fall under
  * AQE's skew-join splitting like any equi-join.
  *
  * Columns must be pre-disambiguated (no shared names between the two
  * sides); point/start/end are numeric (callers convert timestamps via
  * `unix_millis`). Containment is inclusive on both bounds.
  */
object RangeJoin {

  def intervalJoin(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val p = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val iv = intervals
      // drop inverted intervals: sequence() would otherwise silently
      // produce a DESCENDING bucket range (step -1), replicating one
      // corrupt row into ~|e-s|/w junk buckets or failing the job
      .filter(col(endCol) >= col(startCol))
      .withColumn("__bucket",
        explode(sequence(
          floor(col(startCol) / bucketWidth).cast("long"),
          floor(col(endCol) / bucketWidth).cast("long"))))
    p.join(iv, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Interval×interval OVERLAP join — the temporal join between two
    * SCD2 / validity-interval tables ("which of this user's click
    * sessions overlap which purchase sessions"): all pairs whose
    * half-open `[from_ms, to_ms)` windows intersect, per key. The
    * third member of the inequality-join family next to
    * [[intervalJoin]] (point∈interval) and the as-of join. Inputs
    * carry `(keys…, id, from_ms, to_ms)`; a NULL `to_ms` is an OPEN
    * interval and closes at the global max endpoint + 1 (a 1-row
    * broadcast — deterministic, no wall clock). Output:
    * `(keys…, id_a, id_b, overlap_from, overlap_to, overlap_ms)`.
    *
    * Same bucket-replication scheme as [[intervalJoin]], but with BOTH
    * sides exploded onto their `chunkMs`-aligned chunks, so the range
    * predicate becomes a hash equi-join on `(keys, chunk)` — parallel
    * across time even for one hot key. Every overlapping pair is
    * emitted EXACTLY once, no distinct: it is kept only in the chunk
    * containing `greatest(from_a, from_b)` (the overlap's first
    * instant lies in exactly one chunk, and both intervals cover that
    * chunk). Replication factor = span/chunkMs + 1 per interval; pick
    * `chunkMs` near the typical span — correctness is
    * chunk-size-invariant (spec-pinned).
    */
  def overlapJoin(
      a: DataFrame,
      b: DataFrame,
      keys: Seq[String],
      chunkMs: Long): DataFrame = {
    require(chunkMs >= 1, s"chunkMs must be >= 1, got $chunkMs")
    // global exclusive end for open intervals: max over both sides'
    // endpoints, +1 so an interval starting at the max stays non-empty.
    // One projection per side — greatest(from, coalesce(to, from))
    // folds both endpoints into one row, so each input's upstream plan
    // executes once here, not twice per side
    def ends(df: DataFrame) = df.select(
      greatest(col("from_ms"), coalesce(col("to_ms"), col("from_ms"))).as("x"))
    val bound = ends(a).unionAll(ends(b)).agg((max(col("x")) + 1).as("m"))
    def prep(df: DataFrame, side: String): DataFrame =
      df.join(broadcast(bound))
        .select(
          (keys.map(col) ++ Seq(
            col("id").as(s"id_$side"),
            col("from_ms").as(s"from_$side"),
            coalesce(col("to_ms"), col("m")).as(s"to_$side"))): _*)
        .filter(col(s"from_$side") < col(s"to_$side"))
        .withColumn("chunk", explode(sequence(
          expr(s"from_$side div ${chunkMs}L"),
          expr(s"(to_$side - 1) div ${chunkMs}L"))))
    prep(a, "a").join(prep(b, "b"), keys :+ "chunk")
      .filter(col("from_a") < col("to_b") && col("from_b") < col("to_a"))
      .filter(col("chunk") === expr(s"greatest(from_a, from_b) div ${chunkMs}L"))
      .select(
        (keys.map(col) ++ Seq(
          col("id_a"), col("id_b"),
          greatest(col("from_a"), col("from_b")).as("overlap_from"),
          least(col("to_a"), col("to_b")).as("overlap_to"))): _*)
      .withColumn("overlap_ms", col("overlap_to") - col("overlap_from"))
  }
}
