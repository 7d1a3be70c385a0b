package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Bounded grouped top-k as a TypedImperativeAggregate: each buffer
  * holds at most k (value, id) pairs, best-first.
  *
  * Why not a window: `row_number() OVER (PARTITION BY g ORDER BY v)`
  * shuffles and SORTS every row of every group. This aggregate keeps a
  * k-bounded buffer per group, so map-side partial aggregation prunes
  * to <= k rows per (group, partition) BEFORE the shuffle, and no sort
  * ever sees more than k elements per merge — the right shape when
  * groups are huge and k is small (top-k docs per domain at 100 TB).
  *
  * Determinism: total order (value DESC, id ASC); insert and merge
  * preserve it, so the result is independent of row and merge order.
  */
case class TopKAgg(
    value: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(value, id)

  // Fail at analysis, not with a ClassCastException inside update() on
  // an executor: value must be DOUBLE, id must be BIGINT (same contract
  // style as QuantStats/UnicodeNormBase).
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (value.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName value must be DOUBLE, got ${value.dataType.catalogString}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName id must be BIGINT, got ${id.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("v", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_topk"

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  private def insert(buf: ArrayBuffer[(Double, Long)], t: (Double, Long)): Unit = {
    if (buf.length == k && !better(t, buf.last)) return
    var pos = 0
    while (pos < buf.length && better(buf(pos), t)) pos += 1
    buf.insert(pos, t)
    if (buf.length > k) buf.remove(buf.length - 1)
  }

  override def update(buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val v = value.eval(input)
    val i = id.eval(input)
    if (v != null && i != null)
      insert(buf, (v.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: ArrayBuffer[(Double, Long)], other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(buf.map(t => InternalRow(t._1, t._2)).toArray[Any])

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 16)
    buf.foreach { case (v, i) => bb.putDouble(v); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = ArrayBuffer.empty[(Double, Long)]
    while (bb.remaining() >= 16) out += ((bb.getDouble, bb.getLong))
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0), id = newChildren(1))
}
