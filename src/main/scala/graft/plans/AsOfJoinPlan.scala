package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical as-of join — preference (c) of the build brief: a whole-operator
  * extension for semantics Spark lacks natively (temporal "latest right row
  * at or before the left row's time, per key"; cf. the reference's
  * WindowStore lookup pattern, DeduplicateValueTransformer.java:38–48, and
  * pandas merge_asof).
  *
  * The node is built from ALREADY-ANALYZED children (attributes resolved by
  * name against each side), so the analyzer passes it through; planning is
  * `GraftStrategy` → `AsOfJoinExec`. Semantics (and the differential spec)
  * match `operators.AsOfJoin.asOf`: backward as-of, inclusive (`<=`), ties
  * on right time broken by `rightTiebreak` (largest wins), unmatched left
  * rows keep null right columns.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTiebreak: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}
