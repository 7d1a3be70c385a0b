package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a space-separated string, one pass.
  *
  * The HOF formulation
  * `array_distinct(transform(sequence(...), i -> concat(ws[i-1], ...)))`
  * with `ws = split(text)` gets inlined by Catalyst so `split` re-executes
  * for every subscript — O(words²) regex splits per row (measured hot in
  * jstack on the dedup bench). This expression is one split + one pass.
  *
  * `dedup=true, filterEmpty=false` is the original q44/q45 shingle-SET
  * semantics (frozen — its DuckDB oracles split without filtering).
  * The round-5 pipeline ops use `filterEmpty=true` (consecutive spaces
  * produce no empty tokens, the engine-divergence class PolyHash closed)
  * and `dedup=false` where multiplicity matters (repetition metrics).
  *
  * CodegenFallback: one virtual call per row is noise next to the work.
  */
case class WordShingles(
    child: Expression,
    n: Int,
    dedup: Boolean = true,
    filterEmpty: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects string, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val raw = v.asInstanceOf[UTF8String].toString.split(' ')
    val words = if (filterEmpty) raw.filter(_.nonEmpty) else raw
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    // LinkedHashSet preserves first-occurrence order for the dedup case;
    // plain insertion order otherwise.
    val seen: java.util.Collection[String] =
      if (dedup) new java.util.LinkedHashSet[String]()
      else new java.util.ArrayList[String](words.length - n + 1)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
