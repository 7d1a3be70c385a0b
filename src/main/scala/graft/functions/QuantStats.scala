package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** One-pass symmetric int8 quantization statistics for an embedding
  * vector: struct(scale, max_abs_err, cos_sim).
  *
  *  - scale       = max_i |v_i| / 127 (1.0 for the all-zero vector)
  *  - q_i         = floor(v_i / scale + 0.5)   (exact on both engines,
  *                  unlike round(), whose half-way rule is library-defined)
  *  - max_abs_err = max_i |v_i - q_i * scale|
  *  - cos_sim     = cos(v, dequantized v), null if either norm is 0
  *
  * All folds are sequential in array order so the DuckDB oracle
  * (list_transform over range + list_sum) is bit-identical — the
  * [[DotProduct]] determinism contract.
  *
  * CodegenFallback: one virtual call per row around an all-primitive
  * loop (the [[WordShingles]] precedent); the interpreted-HOF
  * alternative re-evaluates the transform per reference (the q115
  * assign-loop defect class).
  */
case class QuantStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_quant_stats"

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("max_abs_err", DoubleType, nullable = false),
    StructField("cos_sim", DoubleType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_quant_stats expects array<double>, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(arr.getDouble(i)); if (a > m) m = a; i += 1
    }
    val scale = if (m == 0.0) 1.0 else m / 127.0
    var maxErr = 0.0
    var dot = 0.0
    var n2v = 0.0
    var n2d = 0.0
    i = 0
    while (i < n) {
      val x = arr.getDouble(i)
      val dq = math.floor(x / scale + 0.5) * scale
      val e = math.abs(x - dq); if (e > maxErr) maxErr = e
      dot += x * dq; n2v += x * x; n2d += dq * dq
      i += 1
    }
    val cos: Any =
      if (n2v == 0.0 || n2d == 0.0) null
      else dot / (math.sqrt(n2v) * math.sqrt(n2d))
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, maxErr, cos))
  }

  override protected def withNewChildInternal(newChild: Expression): QuantStats =
    copy(child = newChild)
}
