package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd 2-D Morton (Z-order) code: interleaves the low 16 bits of
  * two non-negative longs (x in even bit positions, y in odd) into one
  * 32-bit key.
  *
  * This is the data-layout primitive behind multi-column clustering at
  * lake scale: sorting (and range-partitioning file writes) by the
  * Z-order key keeps rows that are close in BOTH key dimensions inside
  * the same file, so min/max file statistics prune scans for predicates
  * on EITHER column — a single-column sort order can only serve one.
  * The whole expression is branch-free bit arithmetic inside
  * WholeStageCodegen; at 100 TB it adds one cheap projected column
  * before a range `repartitionByRange(zkey)` write.
  *
  * The magic-mask spread is the standard public bit-twiddling technique
  * (each step doubles the gap between occupied bit groups). The SQL
  * oracle reproduces it as an unrolled 16-term bit sum, so both engines
  * compute the identical integer.
  */
case class MortonCode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_morton"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_morton expects (bigint, bigint), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    MortonCode.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val cls = MortonCode.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.interleave($x, $y);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MortonCode {

  /** Spread the low 16 bits of v so bit i lands at position 2i. */
  def spread16(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  def interleave(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)

  /** The same interleave as portable ANSI SQL (for the DuckDB oracle):
    * an unrolled sum of per-bit shifts over `x`/`y` column names. */
  def oracleSql(x: String, y: String): String =
    (0 until 16).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")
}
