package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator form of the as-of join (SURVEY §2.3 "absent" tier —
  * the one operator family Spark's built-ins can't express as a single
  * node): a custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`,
  * registered per-session (`AsofJoinStrategy.install`) or at build time
  * via `graft.GraftExtensions`.
  *
  * Semantics (identical to the union+window composition in
  * [[graft.operators.AsofJoin.asofJoin]], which remains the zero-custom
  * fallback): for every left row, attach the payload of the latest
  * right row with the same key and `rightTime <= leftTime`; ties at
  * equal time resolve to the largest `tiebreak`; unmatched left rows
  * get null payload (left-outer).
  *
  * Physical shape: one merge pass over the two sorted sides.
  * `requiredChildDistribution`/`requiredChildOrdering` declare
  * hash-co-partitioning on the key and `(key, time[, tiebreak])`
  * ordering, so `EnsureRequirements` plans the exchanges and sorts —
  * the operator never shuffles by hand and AQE still manages its
  * stages. Versus the union+window form this avoids widening both
  * sides to a common tagged schema and sorting the merged stream: each
  * side sorts only itself, and the merge is streaming O(n+m) per
  * partition with O(1) state (one buffered right row + one match), so
  * it never spills regardless of key skew.
  */
case class AsofJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    tiebreak: Expression,
    payload: Seq[Expression],
    asofAttrs: Seq[Attribute])
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ asofAttrs

  /** The asof_* columns are born here, not read from children. */
  override def producedAttributes: AttributeSet = AttributeSet(asofAttrs)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsofJoinNode {

  /** Resolve column names against the two analyzed children. */
  def resolve(
      left: LogicalPlan,
      right: LogicalPlan,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      tiebreak: String): AsofJoinNode = {
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asofJoin: no column '$name' in ${plan.output.map(_.name).mkString(", ")}"))
    val payloadAttrs = payload.map(attr(right, _))
    val asofAttrs = payloadAttrs.map(a =>
      AttributeReference(s"asof_${a.name}", a.dataType, nullable = true)())
    val (lk, rk) = (keys.map(attr(left, _)), keys.map(attr(right, _)))
    val (lt, rt) = (attr(left, leftTime), attr(right, rightTime))
    // the merge compares raw key/time values across sides — mismatched
    // types (e.g. timestamp vs pre-converted long) would compare
    // garbage silently, so fail at construction like a join would
    lk.zip(rk).foreach { case (a, b) =>
      require(a.dataType == b.dataType,
        s"asofJoin: key type mismatch ${a.name}: ${a.dataType} vs ${b.name}: ${b.dataType}")
    }
    require(lt.dataType == rt.dataType,
      s"asofJoin: time type mismatch $leftTime: ${lt.dataType} vs $rightTime: ${rt.dataType}")
    AsofJoinNode(left, right, lk, rk, lt, rt,
      attr(right, tiebreak), payloadAttrs, asofAttrs)
  }
}

/** Planner rule: logical as-of node → sort-merge exec. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsofJoinNode =>
      AsofJoinExec(planLater(n.left), planLater(n.right),
        n.leftKeys, n.rightKeys, n.leftTime, n.rightTime,
        n.tiebreak, n.payload, n.asofAttrs) :: Nil
    case _ => Nil
  }

  /** Idempotently register on a live session (build-time alternative:
    * `spark.sql.extensions=graft.GraftExtensions`).
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftbridge.Bridge.addStrategy(spark, this)
}

/** Streaming sort-merge as-of join executor. */
case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    tiebreak: Expression,
    payload: Seq[Expression],
    asofAttrs: Seq[Attribute])
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ asofAttrs

  /** As on the logical node: asof_* columns are born here. */
  override def producedAttributes: AttributeSet = AttributeSet(asofAttrs)

  // co-partition both sides on the key; EnsureRequirements plans the
  // exchanges (and elides them over bucketed/pre-partitioned children)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // per-partition merge order; the extra tiebreak sort on the right
  // makes "last consumed at equal time" = "largest tiebreak"
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime :+ tiebreak).map(SortOrder(_, Ascending)))

  // one output row per left row, in place — left's layout survives
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val asofOut = asofAttrs
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), left.output)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), right.output)
      val payloadProj = UnsafeProjection.create(payload, right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(leftKeys.map(_.dataType))
      val tOrd = RowOrdering.createNaturalAscendingOrdering(Seq(leftTime.dataType))
      val resultProj = UnsafeProjection.create(output, left.output ++ asofOut)
      val nullPayload = new GenericInternalRow(payload.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // single buffered right row (copied: sorter iterators reuse rows)
        private var rRow: InternalRow = _
        private var rKey: UnsafeRow = _
        // latest right row consumed for the current key group
        private var matchKey: UnsafeRow = _
        private var matchPayload: UnsafeRow = _

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rRow = rIter.next().copy()
            rKey = rKeyProj(rRow).copy()
          } else { rRow = null; rKey = null }

        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l) // valid until the next lKeyProj call
          val lT = lTimeProj(l).copy() // rTimeProj below reuses its own buffer
          var done = rRow == null
          while (!done) {
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) {
              // right group with no remaining left rows — drop its match
              matchKey = null; matchPayload = null
              advanceRight()
            } else if (c == 0 && tOrd.compare(rTimeProj(rRow), lT) <= 0) {
              matchKey = rKey // already a copy
              matchPayload = payloadProj(rRow).copy()
              advanceRight()
            } else done = true
            if (rRow == null) done = true
          }
          val p =
            if (matchKey != null && keyOrd.compare(matchKey, lKey) == 0) matchPayload
            else nullPayload
          resultProj(joined(l, p))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
