package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Codegen probe of a Spark `util.sketch.BloomFilter`'s bit array —
  * the membership test `df.stat.bloomFilter` builds, without the
  * ScalaUDF boxing/serialization detour on the probe side (the last
  * interpreted hot path the round-12 verdict flagged, q162).
  *
  * Bit-compatible with both sketch generations (the wire format tags
  * which — [[BloomProbe.unpack]] reads it):
  *  - V1 (`BloomFilterImpl`): int positions `h1 + i*h2` for i in 1..k,
  *    sign-flipped, mod bitSize;
  *  - V2 (`BloomFilterImplV2`, what Spark 4 builds): a LONG
  *    accumulator `h1 * Int.MaxValue`, advanced by `+h2` per probe,
  *    sign-flipped copy mod bitSize — with an explicit seed for h1.
  * Both hash the UTF-8 bytes with two chained Murmur3_x86_32 passes;
  * hashing here reads the UTF8String in place (base/offset/len), the
  * same bytes `putString` hashed. Compatibility is PINNED by a
  * property spec cross-checking against the real filter; q162's
  * exactness never depends on it (a bloom can only shrink the
  * candidate set — the verify join decides).
  *
  * The words array rides along as driver metadata inside the
  * expression (the same class of broadcast payload as k-means
  * centroids), shipped once per executor with the serialized plan.
  */
case class BloomProbe(child: Expression, version: Int, numHash: Int,
    seed: Int, words: Array[Long])
    extends UnaryExpression {

  require(numHash > 0 && words.nonEmpty, "empty bloom filter")
  require(version == 1 || version == 2, s"unsupported bloom version $version")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_probe"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_probe expects string, got ${dt.simpleString}")
  }

  private def get(idx: Long): Boolean =
    (words((idx >>> 6).toInt) & (1L << idx)) != 0L

  def probe(s: UTF8String): Boolean = {
    val h1 = Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes,
      if (version == 1) 0 else seed)
    val h2 = Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, h1)
    val bitSize = words.length.toLong * 64L
    if (version == 1) {
      var i = 1
      while (i <= numHash) {
        var ch = h1 + i * h2 // int arithmetic, as BloomFilterImpl
        if (ch < 0) ch = ~ch
        if (!get(ch.toLong % bitSize)) return false
        i += 1
      }
    } else {
      var acc = h1.toLong * Int.MaxValue.toLong
      var i = 0
      while (i < numHash) {
        acc += h2.toLong
        val idx = if (acc < 0) ~acc else acc
        if (!get(idx % bitSize)) return false
        i += 1
      }
    }
    true
  }

  override def nullSafeEval(v: Any): Any = probe(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomProbe].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.probe($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomProbe {
  /** Extract (version, numHashFunctions, seed, bit words) from a built
    * Spark bloom filter via its stable serialization — the only public
    * door to the bits. V1: [ver][k][wordCount][words]; V2 adds a seed:
    * [ver][k][seed][wordCount][words]. */
  def unpack(bf: org.apache.spark.util.sketch.BloomFilter): (Int, Int, Int, Array[Long]) = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    val version = in.readInt()
    require(version == 1 || version == 2,
      s"unexpected bloom serialization version $version")
    val k = in.readInt()
    val seed = if (version == 2) in.readInt() else 0
    val n = in.readInt()
    val words = Array.fill(n)(in.readLong())
    (version, k, seed, words)
  }

  /** Column face: probe `col` against `bf`. */
  def probeCol(c: org.apache.spark.sql.Column,
      bf: org.apache.spark.util.sketch.BloomFilter): org.apache.spark.sql.Column = {
    val (v, k, seed, words) = unpack(bf)
    org.apache.spark.sql.graftbridge.Bridge.column(
      BloomProbe(org.apache.spark.sql.graftbridge.Bridge.expr(c), v, k, seed, words))
  }
}
