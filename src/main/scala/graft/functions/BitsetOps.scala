package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Dense-graph bitset adjacency (the q321 bitmask trick generalized to
  * vertex sets wider than one machine word): when every vertex id fits
  * a small fixed range, a neighbor LIST becomes a fixed-width array of
  * bitmask words, and the per-edge exact intersection count collapses
  * from an O(|A|+|B|) sorted-merge walk over ~500-element arrays to a
  * word-wise AND + popcount over a few dozen words. On the co-supply
  * graph (~1000 vertices, complete at sf0.1) that is a ~30× cut in the
  * dominant per-edge verify work, and the adjacency rows shrink from
  * ~4 KB arrays to ~128 B masks — result-identical because neighbor
  * lists are duplicate-free (distinct edges, injective orientation), so
  * popcount(AND) = |N(a) ∩ N(b)| exactly. Callers GUARD on the id range
  * and keep the sorted-array path as the general fallback.
  */

/** graft_bitset(ids, words): array<bigint> bitmask of `words` 64-bit
  * words with bit `id` set for every id in the input list. Ids MUST be
  * in [0, words*64) — the caller's range guard is part of the contract
  * (out-of-range ids fail loudly rather than alias another vertex). */
case class BitsetBuild(child: Expression, words: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bitset"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bitset expects array<bigint>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val ids = v.asInstanceOf[ArrayData]
    val out = new Array[Long](words)
    var i = 0
    val n = ids.numElements()
    while (i < n) {
      val id = ids.getLong(i)
      if (id < 0 || id >= words.toLong * 64)
        throw new IllegalArgumentException(
          s"graft_bitset: id $id outside [0, ${words * 64})")
      out((id >> 6).toInt) |= 1L << (id & 63)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val id = ctx.freshName("id")
      val w = ctx.freshName("w")
      s"""
         |long[] $w = new long[$words];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  long $id = $a.getLong($i);
         |  if ($id < 0 || $id >= ${words}L * 64) {
         |    throw new IllegalArgumentException(
         |      "graft_bitset: id " + $id + " outside [0, ${words * 64})");
         |  }
         |  $w[(int) ($id >> 6)] |= 1L << ($id & 63);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($w);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_bitand_count(a, b): popcount of the word-wise AND of two
  * bitmask arrays (intersection cardinality of the encoded sets). */
case class BitsetAndCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bitand_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bitand_count expects (array<bigint>, array<bigint>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0L
    var i = 0
    while (i < n) {
      c += java.lang.Long.bitCount(x.getLong(i) & y.getLong(i))
      i += 1
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $c = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $c += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
