package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Sort-merge as-of join (physical).
  *
  * Scale shape: EnsureRequirements shuffles both sides by key
  * (co-partitioned ClusteredDistribution) and sorts each partition by
  * (key, time) — then one streaming merge pass per partition with O(1)
  * state (the latest right row of the current key). No n:m expansion, no
  * per-key buffering: this is the plan that survives 100 TB with skewed
  * keys, because state never exceeds one row.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    // Everything captured by the partition closure must be serializable:
    // bound Expressions are; UnsafeProjection and row buffers are created
    // per partition inside the closure.
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val outAttrs = output
    val nRightCols = right.output.length

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rightNulls = new GenericInternalRow(nRightCols)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val rBuf = rIter.buffered
      val joined = new JoinedRow
      // O(1) merge state: the latest right row seen for the current key.
      var lastKey: Any = null
      var lastTime: Any = null
      var lastRow: InternalRow = null

      lIter.map { lRow =>
        val lk = lKeyB.eval(lRow)
        val lt = lTimeB.eval(lRow)
        if (lk == null || lt == null) {
          // SQL join null semantics: a null key/time never matches —
          // emit unmatched without consulting the (null-intolerant)
          // orderings or disturbing the merge cursor.
          outProj(joined(lRow, rightNulls))
        } else {
          // Advance the right side while its (key, time) <= (lk, lt).
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            val rk = rKeyB.eval(head)
            val rt = rTimeB.eval(head)
            if (rk == null || rt == null) {
              rBuf.next() // null-keyed right rows can never match anyone
            } else {
              val cmpK = keyOrd.compare(rk, lk)
              if (cmpK < 0 || (cmpK == 0 && timeOrd.compare(rt, lt) <= 0)) {
                if (cmpK == 0) {
                  lastKey = rk; lastTime = rt; lastRow = head.copy()
                }
                rBuf.next()
              } else advancing = false
            }
          }
          val matched = lastRow != null && keyOrd.compare(lastKey, lk) == 0 &&
            timeOrd.compare(lastTime, lt) <= 0
          outProj(joined(lRow, if (matched) lastRow else rightNulls))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
