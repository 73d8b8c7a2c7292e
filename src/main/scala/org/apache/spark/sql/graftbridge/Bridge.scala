package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst Expression bridge.
  *
  * Spark 4 made `Column` a thin wrapper over a connect-compatible
  * `ColumnNode`; the classic-backend conversion helpers live in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]`. This shim (compiled inside the `org.apache.spark.sql`
  * package tree — our own source, no Spark code copied) re-exports the
  * two conversions so graft's native expressions can participate in the
  * public Column algebra.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a temp SQL function on an EXISTING session (the driver
    * hands us its session, so `SparkSessionExtensions.injectFunction`
    * at build time isn't available — this is the post-hoc equivalent).
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Apply an extensions object's function injections to a live
    * session's registry — the test hook for the
    * `spark.sql.extensions` build path (`registerFunctions` is
    * `private[sql]`, hence surfaced here).
    */
  def applyFunctionInjections(
      ext: org.apache.spark.sql.SparkSessionExtensions,
      spark: org.apache.spark.sql.SparkSession): Unit =
    ext.registerFunctions(spark.sessionState.functionRegistry)

  /** Wrap a custom logical plan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`).
    */
  def dataset(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Idempotently add a planner strategy to a live session — the
    * post-build equivalent of `SparkSessionExtensions.injectPlannerStrategy`.
    */
  def addStrategy(
      spark: org.apache.spark.sql.SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }
}
