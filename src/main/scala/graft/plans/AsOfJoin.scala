package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF JOIN — the temporal join Spark lacks natively (and the shape
  * of the reference's usage query: match each event with the latest
  * prior event of the other kind, machine-usage/logic.rs:29-52). For
  * each left row, emit it with the LATEST right row of the same key
  * whose time is ≤ the left time (inner semantics: unmatched lefts are
  * dropped; optional tolerance bounds the look-back).
  *
  * This is the full custom-operator path (SURVEY §7.4 escalation (c)):
  * logical node → planner strategy → physical sort-merge exec,
  * registered through `SparkSessionExtensions.injectPlannerStrategy`
  * ([[graft.GraftExtensions]]). Catalyst still owns distribution and
  * ordering: the exec DECLARES `ClusteredDistribution` on the keys and
  * per-partition (key, time) ordering, and `EnsureRequirements` plans
  * the exchanges/sorts — at scale both sides hash-shuffle once and the
  * merge is a single forward pass per partition, O(1) state (the
  * current candidate row), never materializing a group.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                    leftTime: Expression, rightTime: Expression,
                    tolerance: Option[Long])
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTime: Expression, rightTime: Expression,
                        tolerance: Option[Long],
                        left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning = left.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output; val rOut = right.output
    val lKeysB = leftKeys; val rKeysB = rightKeys
    val lTimeB = leftTime; val rTimeB = rightTime
    val tol = tolerance
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = UnsafeProjection.create(lKeysB, lOut)
      val rKey = UnsafeProjection.create(rKeysB, rOut)
      val lTimeP = UnsafeProjection.create(Seq(lTimeB), lOut)
      val rTimeP = UnsafeProjection.create(Seq(rTimeB), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeysB.map(_.dataType))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // O(1) merge state: latest admissible right row for the key the
      // cursor is currently inside (both inputs sorted by (key, time))
      var cand: InternalRow = null
      var candKey: UnsafeRow = null
      var candTime = 0L

      lIter.flatMap { lRow =>
        val lk = lKey(lRow)
        if (lk.anyNull) Iterator.empty // null keys never match (join semantics)
        else {
          val ltRow = lTimeP(lRow)
          if (ltRow.isNullAt(0)) Iterator.empty
          else {
            val lt = ltRow.getLong(0)
            var continue = true
            while (continue && rBuf.hasNext) {
              val head = rBuf.head
              val rk = rKey(head)
              val cmp = keyOrd.compare(rk, lk)
              if (cmp < 0) rBuf.next() // right behind left's key: discard
              else if (cmp == 0) {
                val rtRow = rTimeP(head)
                if (!rtRow.isNullAt(0) && rtRow.getLong(0) <= lt) {
                  if (!rk.anyNull) { // null-keyed rights never match
                    cand = head.copy(); candKey = rk.copy()
                    candTime = rtRow.getLong(0)
                  }
                  rBuf.next()
                } else if (rtRow.isNullAt(0)) rBuf.next() // null time: skip
                else continue = false // right ahead in time: stop for this left
              } else continue = false // right ahead in key: stop
            }
            val keyOk = cand != null && candKey != null &&
              keyOrd.compare(candKey, lk) == 0
            val tolOk = keyOk && tol.forall(t => lt - candTime <= t)
            if (keyOk && tolOk) Iterator.single(resultProj(joined(lRow, cand)))
            else Iterator.empty
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Plans the logical [[AsOfJoin]] onto [[AsOfJoinExec]]; injected via
  * `SparkSessionExtensions.injectPlannerStrategy`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tol) =>
      AsOfJoinExec(lk, rk, lt, rt, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}
