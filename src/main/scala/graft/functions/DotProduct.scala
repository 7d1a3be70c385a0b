package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two `array<double>` columns.
  *
  * Spark's higher-order functions (`aggregate`/`zip_with`) are interpreted
  * (no whole-stage codegen) and allocate an intermediate array per row —
  * on an all-pairs similarity join that dominates runtime. This expression
  * compiles to a primitive loop inside WholeStageCodegen.
  *
  * The fold is the same sequential left-to-right order as
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,x) -> acc+x)`, so
  * results are bit-identical to the HOF formulation (and to DuckDB's
  * `list_sum(list_transform(...))`).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {

  /** The full custom-function surface as (name, builder) — single source
    * for runtime registration AND [[graft.GraftExtensions]] injection. */
  def builders: Seq[(String,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    "graft_dot" -> (exprs => DotProduct(exprs(0), exprs(1))),
    "graft_shingles3" -> (exprs => WordShingles(exprs.head, 3)),
    // Round-5 pipeline-op variants: empty tokens filtered; words/bigrams
    // keep multiplicity (repetition metrics), 5-gram shingles are a set
    // (decontamination).
    "graft_words" -> (exprs =>
      WordShingles(exprs.head, 1, dedup = false, filterEmpty = true)),
    "graft_bigrams" -> (exprs =>
      WordShingles(exprs.head, 2, dedup = false, filterEmpty = true)),
    "graft_shingles5" -> (exprs =>
      WordShingles(exprs.head, 5, dedup = true, filterEmpty = true)),
    "graft_minhash" -> (exprs => MinHashSig(exprs.head,
      graft.operators.TextOps.hashA, graft.operators.TextOps.hashB,
      graft.operators.TextOps.MinhashP)),
    "graft_quant_stats" -> (exprs => QuantStats(exprs.head)),
    "graft_cms" -> (exprs => CountMinSketchAgg(exprs.head,
      graft.operators.SketchOps.Depth, graft.operators.SketchOps.Width,
      graft.operators.SketchOps.cmsA, graft.operators.SketchOps.cmsB,
      graft.operators.SketchOps.P).toAggregateExpression()),
    "graft_nfc" -> (exprs => NfcNormalize(exprs.head)),
    "graft_isect_count" -> (exprs =>
      SortedIntersectCount(exprs(0), exprs(1))),
    // graft_bitset(ids, words) — words a literal int (fixed mask width)
    "graft_bitset" -> (exprs => BitsetBuild(exprs(0),
      foldableLong(exprs(1), "words").toInt)),
    "graft_bitand_count" -> (exprs =>
      BitsetAndCount(exprs(0), exprs(1))),
    "graft_char_stats" -> (exprs => CharStats(exprs.head)),
    "graft_morton" -> (exprs => MortonCode(exprs(0), exprs(1))),
    "graft_hilbert" -> (exprs => HilbertCode(exprs(0), exprs(1))),
    "graft_strip_accents" -> (exprs => StripAccents(exprs.head)),
    // graft_polyhash(s, seed, mult, mod) — seed/mult/mod literal longs
    "graft_polyhash" -> (exprs => PolyHash(exprs.head,
      foldableLong(exprs(1), "seed"), foldableLong(exprs(2), "mult"),
      foldableLong(exprs(3), "mod"))),
    // graft_topk(value, id, k) — k a literal int
    "graft_topk" -> (exprs => TopKAgg(exprs(0), exprs(1),
      foldableLong(exprs(2), "k").toInt).toAggregateExpression()))

  private def foldableLong(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      what: String): Long = {
    require(e.foldable, s"graft function argument '$what' must be a literal")
    e.eval(null) match {
      case i: Int => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(
        s"'$what' must be an integer literal, got $other")
    }
  }

  /** Register graft SQL functions on the session (idempotent). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "scala_udf")
    }
}
