package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, StringType}

import java.text.Normalizer

/** Unicode text canonicalization for dedup/quality keys, as codegen
  * expressions (Spark ships neither; a Scala UDF would break
  * whole-stage codegen in the per-document hot loop).
  *
  * - NfcNormalize: canonical composition (NFC). Dedup keys MUST be
  *   NFC'd first — "é" (U+00E9) and "e"+combining-acute (U+0065 U+0301)
  *   are byte-different but the same text; un-normalized corpora leak
  *   duplicates straight past exact dedup.
  * - StripAccents: NFD then drop combining marks (Mn) — the classic
  *   accent fold for fuzzy matching ("café" -> "cafe").
  *
  * Both match DuckDB's nfc_normalize / strip_accents, which the
  * oracles use. ASCII is a fast-path no-op (Normalizer.isNormalized is
  * O(n) scan-only for ASCII), so the cost at 100 TB is paid only by
  * documents that need it.
  */
abstract class UnicodeNormBase extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${dt.simpleString}")
  }

  def transform(s: UTF8String): UTF8String

  override def nullSafeEval(v: Any): Any = transform(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unicodeNorm", this, classOf[UnicodeNormBase].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.transform($s);")
  }
}

case class NfcNormalize(child: Expression) extends UnicodeNormBase {
  override def prettyName: String = "graft_nfc"

  override def transform(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class StripAccents(child: Expression) extends UnicodeNormBase {
  override def prettyName: String = "graft_strip_accents"

  override def transform(s: UTF8String): UTF8String = {
    val str = s.toString
    val nfd = Normalizer.normalize(str, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val c = nfd.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
