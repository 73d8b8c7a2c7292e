package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{DotQExpr, NormQExpr, PortableHashExpr, QuantizeE6Expr, RollingHashesExpr, ShingleHashesExpr}

/** Session-build-time registration of graft's native SQL functions —
  * the idiomatic `SparkSessionExtensions` path:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions()(_))
  * }}}
  *
  * After either, `graft_portable_hash`, `graft_dot_q`, `graft_norm_q`,
  * `graft_quantize_e6` and `graft_shingle_hashes` are plain SQL
  * functions in every derived session (unlike the per-session temp
  * registration in [[graft.functions.NativeOps.registerSql]], which
  * exists for sessions we don't build — e.g. the driver's).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // whole-operator extensions (SURVEY §2.3 absent tier)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"graft_shingle_hashes: $what must be an integer literal, got $other")
  }

  private def boolLit(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"graft_shingle_hashes: $what must be a boolean literal, got $other")
  }

  /** The single source of truth for name → builder; shared with
    * [[graft.functions.NativeOps.registerSql]].
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_portable_hash"),
      new ExpressionInfo(classOf[PortableHashExpr].getName, "graft_portable_hash"),
      es => PortableHashExpr(es.head)),
    (FunctionIdentifier("graft_dot_q"),
      new ExpressionInfo(classOf[DotQExpr].getName, "graft_dot_q"),
      es => DotQExpr(es(0), es(1))),
    (FunctionIdentifier("graft_norm_q"),
      new ExpressionInfo(classOf[NormQExpr].getName, "graft_norm_q"),
      es => NormQExpr(es.head)),
    (FunctionIdentifier("graft_quantize_e6"),
      new ExpressionInfo(classOf[QuantizeE6Expr].getName, "graft_quantize_e6"),
      es => QuantizeE6Expr(es.head)),
    // graft_shingle_hashes(text, n, portable) — n/portable must be literals
    (FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashesExpr].getName, "graft_shingle_hashes"),
      es => ShingleHashesExpr(es.head,
        intLit(es(1), "n"), boolLit(es(2), "portable"))),
    // graft_rolling_hashes(text, k, portable) — k/portable must be literals
    (FunctionIdentifier("graft_rolling_hashes"),
      new ExpressionInfo(classOf[RollingHashesExpr].getName, "graft_rolling_hashes"),
      es => RollingHashesExpr(es.head,
        intLit(es(1), "k"), boolLit(es(2), "portable")))
  )
}
