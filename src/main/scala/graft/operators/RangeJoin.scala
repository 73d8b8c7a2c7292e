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
}
