package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation under a unigram piece model with INTEGER costs
  * — the E-step of a SentencePiece-style unigram-LM trainer made
  * cross-engine exact (no log-floats anywhere):
  *
  *  - `vocab` maps pieces (length 1..maxPieceLen) to integer costs
  *    (64 − bitLength(count): a quantized −log2 count, portable as
  *    `64 − length(bin(n))` in SQL);
  *  - the best segmentation minimizes the TRIPLE (total cost, piece
  *    count, cut-position bitmask) lexicographically. All three are
  *    integers and each extension adds the same increment to any
  *    prefix, so the DP's optimal-substructure argument is exact and
  *    an oracle that ENUMERATES all segmentations and takes the
  *    ORDER BY (cost, np, cutmask) minimum provably picks the same
  *    winner.
  *
  * One primitive-loop pass per row (O(len × maxPieceLen) map lookups),
  * invoked as a direct call from generated code — no interpreted HOFs
  * in the hot path. Words are bounded (the caller filters length ≤
  * [[UnigramViterbi.MaxWordLen]]), so the cutmask fits a long.
  */
case class UnigramViterbi(child: Expression, vocab: Array[(String, Int)])
    extends UnaryExpression {

  require(vocab.nonEmpty)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true // unsegmentable words
  override def prettyName: String = "graft_unigram_viterbi"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_unigram_viterbi expects string, got ${dt.simpleString}")
  }

  @transient private lazy val costOf: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocab.length * 2)
    vocab.foreach { case (p, c) => m.put(p, c) }
    m
  }

  @transient private lazy val maxPieceLen: Int =
    vocab.iterator.map(_._1.length).max

  /** The winning segmentation's pieces, in order; null only for an
    * unsegmentable word (a character outside the vocab — the trainer
    * guarantees all single characters are vocab members). */
  def segment(w: UTF8String): ArrayData = {
    val s = w.toString
    val n = s.length
    val INF = Long.MaxValue / 4
    // dp triples per position + backpointer (chosen piece length)
    val cost = new Array[Long](n + 1)
    val np = new Array[Long](n + 1)
    val mask = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      cost(i) = INF; np(i) = INF; mask(i) = INF
      var l = 1
      val lMax = math.min(maxPieceLen, i)
      while (l <= lMax) {
        if (cost(i - l) < INF) {
          val c = costOf.get(s.substring(i - l, i))
          if (c != null) {
            val nc = cost(i - l) + c.intValue()
            val nn = np(i - l) + 1
            // a cut at the FINAL position is shared by every
            // segmentation — only interior cuts discriminate
            val nm = mask(i - l) + (if (i < n) 1L << i else 0L)
            if (nc < cost(i) || (nc == cost(i) && (nn < np(i) ||
              (nn == np(i) && nm < mask(i))))) {
              cost(i) = nc; np(i) = nn; mask(i) = nm; back(i) = l
            }
          }
        }
        l += 1
      }
      i += 1
    }
    if (cost(n) >= INF) return null
    val out = new Array[AnyRef](np(n).toInt)
    var pos = n
    var k = np(n).toInt - 1
    while (pos > 0) {
      val l = back(pos)
      out(k) = UTF8String.fromString(s.substring(pos - l, pos))
      k -= 1
      pos -= l
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(w: Any): Any = segment(w.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one direct call into the DP loop per row — keeps the surrounding
    // pipeline in whole-stage codegen without inlining the DP body
    val ref = ctx.addReferenceObj("unigramViterbi", this,
      classOf[UnigramViterbi].getName)
    val code = nullSafeCodeGen(ctx, ev, w =>
      s"""
         |${ev.value} = $ref.segment($w);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
    code
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramViterbi {
  /** Words longer than this are excluded from training on BOTH engines
    * (the oracle's full-enumeration replay is exponential in length). */
  val MaxWordLen = 10
}
