package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Codegen'd polynomial string hash:
  * `fold(codepoints(s), seed, (acc, c) -> (acc * mult + c) % mod)` —
  * bit-identical to the SQL formulation
  * `aggregate(transform(sequence(1, length(s)), i -> ascii(substring(s, i, 1))), seed, ...)`
  * it replaces (mod at each step keeps every intermediate < 2^36, so
  * Spark long and DuckDB int128 agree — the cross-engine rule the
  * SimHash oracle relies on). Folding is over CODEPOINTS, exactly like
  * `substring`/`ascii` (one element per codepoint, surrogate pairs are
  * one step).
  *
  * The interpreted HOF ran once per DISTINCT token (dictionary
  * encoding) — still the vocabulary-scan hot loop at corpus scale; this
  * compiles it into WholeStageCodegen with zero per-row allocation.
  */
case class PolyHash(child: Expression, seed: Long, mult: Long, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_polyhash expects string, got ${dt.simpleString}")
  }

  /** The shared fold, used by interpreted eval and referenced from the
    * generated code (one virtual call per ROW, loop stays primitive). */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = seed
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * mult + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }

  override def nullSafeEval(v: Any): Any = hash(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("polyHash", this, classOf[PolyHash].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.hash($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
