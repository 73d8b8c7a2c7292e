package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal lookup) join: for every left row, attach the payload
  * of the latest right row with the same key and `rightTime <=
  * leftTime` (inclusive). The operator the reference lacks entirely
  * (SURVEY §2.3 "absent" row) but that every time-series / feature-store
  * pipeline needs.
  *
  * Implementation is the scalable union+window form, NOT a range join:
  * tag both sides, union, and per key take the running "last right
  * payload" over an event-time sort. One shuffle + one sort per key —
  * survives 100 TB where an inequality join would either cross-product
  * or need a specialized range-join planner. Right payload travels as a
  * single struct so all attached columns come from the SAME right row.
  *
  * Determinism: ties at equal (key, time) resolve right-before-left
  * (inclusive as-of) and among right rows by ascending `tiebreak`
  * (the largest tiebreak wins).
  */
object AsofJoin {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      tiebreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val rstruct = struct((payload :+ tiebreak).distinct.map(col): _*)
    val lrowType = left.select(struct(leftCols.map(col): _*)).schema.head.dataType
    val rrowType = right.select(rstruct).schema.head.dataType
    // order ties by the tiebreak's NATURAL type (string, timestamp,
    // numeric all sort correctly) — a cast("long") would null out
    // non-numeric tiebreaks and make equal-time resolution
    // nondeterministic, diverging from the native exec's ordering
    val tbType = right.select(col(tiebreak)).schema.head.dataType
    val lTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(0).as("__side"),
        lit(null).cast(tbType).as("__tb"),
        struct(leftCols.map(col): _*).as("__lrow"),
        lit(null).cast(rrowType).as("__rrow")): _*)
    val rTagged = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(1).as("__side"),
        col(tiebreak).as("__tb"),
        lit(null).cast(lrowType).as("__lrow"),
        rstruct.as("__rrow")): _*)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").desc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = lTagged.unionByName(rTagged)
      .withColumn("__asof", last(col("__rrow"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
    val outLeft = leftCols.map(c => col(s"__lrow.$c").as(c))
    val outRight = payload.map(c => col(s"__asof.$c").as(s"asof_$c"))
    attached.select(outLeft ++ outRight: _*)
  }

  /** Convenience single-key overload. */
  def asofJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      payload: Seq[String], tiebreak: String): DataFrame =
    asofJoin(left, right, Seq(key), leftTime, rightTime, payload, tiebreak)

  /** Whole-operator form: same semantics through the custom
    * `AsofJoinNode → AsofJoinStrategy → AsofJoinExec` path
    * ([[graft.plans.AsofJoinPlan]]) — a single streaming merge per key
    * partition instead of union+window. Registers the planner strategy
    * on the session idempotently.
    */
  def asofJoinNative(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      tiebreak: String): DataFrame = {
    val spark = left.sparkSession
    graft.plans.AsofJoinStrategy.install(spark)
    // Re-alias the right side so its output attributes get fresh
    // exprIds: when both sides derive from the same relation (self
    // as-of), the analyzer's DeduplicateRelations re-ids the right
    // subtree but cannot know our node's rightKeys/rightTime belong to
    // it — distinct ids at construction remove the ambiguity outright.
    val rFresh = right.select(right.columns.map(c => col(c).as(c)): _*)
    org.apache.spark.sql.graftbridge.Bridge.dataset(spark,
      graft.plans.AsofJoinNode.resolve(
        left.queryExecution.analyzed, rFresh.queryExecution.analyzed,
        keys, leftTime, rightTime, payload, tiebreak))
  }
}
