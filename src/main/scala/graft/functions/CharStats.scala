package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document character statistics:
  * (n_chars, distinct_chars, top_char, top_n) over CODE POINTS.
  *
  * The q210 char-diversity filter originally exploded one row per
  * character and shuffled the (doc, char) stream to count — corpus x
  * avg-doc-length rows through an exchange, and the one 10x scale-smoke
  * flag of the round (14x on 10x data). This expression computes the
  * whole per-doc histogram inside the scan projection: zero extra rows,
  * zero shuffle, the same WholeStageCodegen span as the rest of the
  * row. Ties on the top character break to the SMALLEST code point —
  * identical to `ORDER BY n DESC, c` over single-codepoint strings on
  * both engines (UTF-8 byte order = code-point order).
  *
  * Surrogate pairs are consumed as single code points (the q119
  * byte-vs-codepoint lesson; the adversarial corpus pins it).
  */
case class CharStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("distinct_chars", LongType, nullable = false),
    StructField("top_char", StringType),
    StructField("top_n", LongType, nullable = false)))

  override def prettyName: String = "graft_char_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_char_stats expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    CharStats.compute(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = CharStats.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $cls.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object CharStats {

  /** Histogram fold over code points; ties to the smallest code point. */
  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    val counts = new java.util.HashMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    if (n == 0)
      return InternalRow(0L, 0L, null, 0L)
    var topCp = -1
    var topN = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cp = e.getKey.intValue()
      val c = e.getValue.longValue()
      if (c > topN || (c == topN && (topCp == -1 || cp < topCp))) {
        topN = c; topCp = cp
      }
    }
    InternalRow(n, counts.size().toLong,
      UTF8String.fromString(new String(Character.toChars(topCp))), topN)
  }
}
