package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** True iff ANY element of the input long array is a member of the
  * broadcast SORTED set — binary search per element, O(n log |set|),
  * no per-row allocation. The streaming decontamination gate's per-doc
  * probe: the eval-set gram hashes ride along as driver metadata
  * (bounded, like k-means centroids), so the stream side stays
  * STATELESS — no shuffle, no state store, just a codegen flag. */
case class AnyInSortedSet(child: Expression, sorted: Array[Long])
    extends UnaryExpression {

  require(sorted.nonEmpty, "empty membership set")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_any_in_sorted"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_any_in_sorted expects array<bigint>, got ${dt.simpleString}")
  }

  def probe(xs: ArrayData): Boolean = {
    val n = xs.numElements()
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i) &&
        java.util.Arrays.binarySearch(sorted, xs.getLong(i)) >= 0)
        return true
      i += 1
    }
    false
  }

  override def nullSafeEval(v: Any): Any = probe(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("anyInSorted", this,
      classOf[AnyInSortedSet].getName)
    nullSafeCodeGen(ctx, ev, xs => s"${ev.value} = $ref.probe($xs);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
