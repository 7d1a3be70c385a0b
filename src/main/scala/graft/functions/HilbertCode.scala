package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd 2-D Hilbert-curve index (order 16): maps the low 16 bits
  * of two non-negative longs to the cell's position along the Hilbert
  * space-filling curve.
  *
  * The layout companion to [[MortonCode]]: both linearize 2-D keys for
  * clustered writes, but the Hilbert walk moves to a GRID-ADJACENT
  * cell at every step (Morton takes long diagonal jumps at power-of-2
  * boundaries), so consecutive key ranges cover tighter bounding boxes
  * — tighter per-file min/max stats, better 2-D predicate pruning.
  * The spec pins exactly that: the full order-6 walk visits 4096 cells
  * with every consecutive pair at Manhattan distance 1, and per-bucket
  * bbox areas undercut Morton's on the same data.
  *
  * Iterative bit algorithm (the standard public formulation): per bit
  * plane s from high to low, quadrant q = (3*rx) XOR ry advances d by
  * s²·q, then the quadrant rotation/reflection re-frames (x, y). The
  * loop body is branch-light integer arithmetic inside
  * WholeStageCodegen — one cheap projected column before a
  * `repartitionByRange(hkey)` write, exactly like the Morton path.
  * [[oracleCtes]] emits the SAME 16 levels as a portable chained-CTE
  * SQL text (parameterized on the integer-division spelling) so DuckDB
  * reproduces the identical integer.
  */
case class HilbertCode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_hilbert expects (bigint, bigint), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    HilbertCode.xy2d(16, x.asInstanceOf[Long], y.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val cls = HilbertCode.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.xy2d(16, $x, $y);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertCode {

  /** Hilbert distance of cell (x, y) on the 2^order × 2^order grid. */
  def xy2d(order: Int, x0: Long, y0: Long): Long = {
    val n = 1L << order
    var x = x0 & (n - 1)
    var y = y0 & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** The same 16 levels as portable chained-CTE SQL. `src` must expose
    * columns `x`, `y` (0..65535) plus the `pass` columns, all carried
    * through; the final CTE (returned name) adds bigint `d`.
    * `intDiv` is the engine's integer-division operator spelling
    * ("div" for Spark, "//" for DuckDB). */
  def oracleCtes(src: String, pass: Seq[String], intDiv: String)
      : (String, String) = {
    val bits = 16
    val n = 1L << bits
    val keep = (pass :+ "x0") :+ "y0"
    val passPrefix = pass.map(_ + ", ").mkString
    val init =
      s"""hl0 AS (
         |  SELECT ${passPrefix}x AS x0, y AS y0, x, y,
         |    CAST(0 AS BIGINT) AS d
         |  FROM $src)""".stripMargin
    val levels = (0 until bits).map { i =>
      val s = 1L << (bits - 1 - i)
      val rx = s"(x $intDiv $s) % 2"
      val ry = s"(y $intDiv $s) % 2"
      s"""hl${i + 1} AS (
         |  SELECT ${keep.mkString(", ")},
         |    CASE WHEN $ry = 1 THEN x
         |         WHEN $rx = 1 THEN ${n - 1} - y ELSE y END AS x,
         |    CASE WHEN $ry = 1 THEN y
         |         WHEN $rx = 1 THEN ${n - 1} - x ELSE x END AS y,
         |    d + CAST(${s * s} AS BIGINT) * (CASE WHEN $rx = 0 AND $ry = 0 THEN 0
         |                         WHEN $rx = 0 THEN 1
         |                         WHEN $ry = 1 THEN 2
         |                         ELSE 3 END) AS d
         |  FROM hl$i)""".stripMargin
    }
    ((init +: levels).mkString(",\n"), s"hl$bits")
  }
}
