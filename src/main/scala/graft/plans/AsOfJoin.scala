package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical as-of join: for each left row, the right row with the same key
  * and the greatest rightTime <= leftTime (left-outer semantics).
  *
  * The reference has no such operator (SURVEY §2.3 "not present"); it is
  * the canonical event-time alignment primitive for training-data
  * pipelines (align each example with the most recent prior state).
  * Implemented as the full custom-operator route — logical node +
  * Strategy + SparkPlan (SURVEY §7.3 option c) — because no composition
  * of built-ins gives the single-pass sort-merge plan: the window/filter
  * rewrite materializes an n:m join first.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryNode {

  // Left-outer: right side nullable.
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}
