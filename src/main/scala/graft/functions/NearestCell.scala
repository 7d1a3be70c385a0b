package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Codegen'd IVF coarse-cell assignment: argmin over the broadcast
  * centroid matrix of the squared-L2 distance to the input vector, ties
  * broken by lowest cell id.
  *
  * Replaces the interpreted `aggregate(... zip_with ...)` HOF argmin in
  * [[graft.operators.KMeansLite.assign]], which evaluated the distance
  * fold TWICE per centroid (once in the CASE test, once in the struct) —
  * the per-row hot loop of IVF assignment at scale. This compiles to a
  * primitive double loop inside WholeStageCodegen: one distance
  * evaluation per centroid, no per-row allocation.
  *
  * The distance is the same sequential left fold
  * `aggregate(zip_with(v, c, (a,b) -> (a-b)*(a-b)), 0D, (acc,x) -> acc+x)`
  * used before, and argmin keeps the FIRST strict minimum — results are
  * bit-identical to the HOF formulation and to a DuckDB
  * `list_sum(list_transform(...))` + `ORDER BY d2, cid` replication.
  */
case class NearestCell(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {

  require(cents.nonEmpty)

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_cell"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_cell expects array<double>, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val xs = v.asInstanceOf[ArrayData]
    var best = Double.PositiveInfinity
    var bestCid = -1
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      val n = math.min(xs.numElements(), cv.length)
      var d2 = 0.0
      var i = 0
      while (i < n) {
        val d = xs.getDouble(i) - cv(i)
        d2 += d * d
        i += 1
      }
      if (d2 < best) { best = d2; bestCid = c }
      c += 1
    }
    bestCid
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("nearestCents", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, xs => {
      val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      val n = ctx.freshName("n")
      val d2 = ctx.freshName("d2")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      s"""
         |double $best = Double.POSITIVE_INFINITY;
         |int $bestCid = -1;
         |for (int $c = 0; $c < $cRef.length; $c++) {
         |  double[] $cv = $cRef[$c];
         |  int $n = java.lang.Math.min($xs.numElements(), $cv.length);
         |  double $d2 = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = $xs.getDouble($i) - $cv[$i];
         |    $d2 += $d * $d;
         |  }
         |  if ($d2 < $best) { $best = $d2; $bestCid = $c; }
         |}
         |${ev.value} = $bestCid;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
