package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd MinHash signature: given an array of element hashes
  * `x_0..x_{m-1}` (longs in [0, p)), returns the k-long signature
  * `sig_i = min_j pmod(a_i * x_j + b_i, p)`.
  *
  * One fused pass over the input computes all k minima — versus k
  * interpreted `array_min(transform(...))` HOF evaluations (k array
  * allocations per row), which dominated the LSH dedup benchmark.
  */
case class MinHashSig(child: Expression, a: Array[Long], b: Array[Long], p: Long)
    extends UnaryExpression {

  require(a.length == b.length && a.nonEmpty)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<bigint>, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val xs = v.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val k = a.length
    val sig = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val x = xs.getLong(j)
      var i = 0
      while (i < k) {
        val h = java.lang.Math.floorMod(a(i) * x + b(i), p)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", a, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", b, "long[]")
    nullSafeCodeGen(ctx, ev, xs => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val h = ctx.freshName("h")
      s"""
         |int $n = $xs.numElements();
         |int $k = $aRef.length;
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  long $x = $xs.getLong($j);
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $h = java.lang.Math.floorMod($aRef[$i] * $x + $bRef[$i], ${p}L);
         |    if ($h < $sig[$i]) $sig[$i] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
