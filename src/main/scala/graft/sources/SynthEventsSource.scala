package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2: a deterministic synthetic event generator —
  * the source shape a 100 TB benchmark/load-test corpus comes from.
  * Row i (0 <= i < rows) is a pure integer function of i, so any
  * engine can regenerate the identical relation (the DuckDB oracle
  * rebuilds it from range()).
  *
  * Engine integration (the point of the exercise):
  *  - `SupportsPushDownRequiredColumns`: the reader materializes ONLY
  *    the pruned schema — an unprojected column is never generated.
  *  - `SupportsPushDownFilters`: event_id range predicates narrow the
  *    generated id interval itself (the generator's version of
  *    partition pruning); everything else is left for Spark to
  *    evaluate post-scan.
  *  - `planInputPartitions`: the (already filter-narrowed) interval is
  *    split into `slices` equal ranges — generation parallelism is
  *    cluster-width, no driver materialization anywhere.
  *
  * Usage: spark.read.format("graft.sources.SynthEventsSource")
  *   .option("rows", n).option("slices", p).load()
  */
class SynthEventsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthEventsSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L)
    val slices = Option(properties.get("slices")).map(_.toInt).getOrElse(8)
    new SynthTable(rows, slices)
  }
}

object SynthEventsSource {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("cents", LongType, nullable = false)))

  /** The row formulas (shared with the oracle; BIGINT-exact). */
  def userId(i: Long): Long = (i * 2654435761L) % 1000
  def eventType(i: Long): String = "t" + ((i * 7919) % 5)
  def cents(i: Long): Long = (i * 104729) % 100000
}

private class SynthTable(rows: Long, slices: Int)
  extends Table with SupportsRead {
  override def name(): String = s"synth_events($rows)"
  override def schema(): StructType = SynthEventsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, slices,
      Option(options.get("batchRows")).map(_.toLong).getOrElse(rows))
}

private class SynthScanBuilder(rows: Long, slices: Int, batchRows: Long)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns with SupportsPushDownFilters
  with SupportsPushDownAggregates with SupportsPushDownLimit {
  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate._

  private var lo = 0L
  private var hi = rows
  private var pruned: StructType = SynthEventsSource.schema
  private var pushed: Array[Filter] = Array.empty
  private var pushedAgg: Seq[String] = Nil

  // ---- aggregate pushdown: COUNT(*) / MIN(event_id) / MAX(event_id)
  // over the (already filter-narrowed) id interval are closed-form —
  // the scan answers them in O(1) with a single one-row partition and
  // no row generation at all. COMPLETE pushdown: Spark plans no
  // re-aggregation on top.

  private def idCol(e: org.apache.spark.sql.connector.expressions.Expression)
      : Boolean = e match {
    case nr: NamedReference => nr.fieldNames.mkString(".") == "event_id"
    case _ => false
  }

  private def aggKinds(agg: Aggregation): Option[Seq[String]] = {
    if (agg.groupByExpressions.nonEmpty || agg.aggregateExpressions.isEmpty)
      None
    else {
      val ks = agg.aggregateExpressions.toSeq.map {
        case _: CountStar => "count"
        case m: Min if idCol(m.column) => "min"
        case m: Max if idCol(m.column) => "max"
        case _ => return None
      }
      Some(ks)
    }
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    aggKinds(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    aggKinds(agg) match {
      case Some(ks) => pushedAgg = ks; true
      case None => false
    }

  override def pruneColumns(requiredSchema: StructType): Unit =
    pruned = requiredSchema

  // Literal values arrive boxed (Integer or Long depending on how the
  // predicate was written); normalize before narrowing the range.
  private def asLong(v: Any): Option[Long] = v match {
    case n: java.lang.Number => Some(n.longValue)
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case GreaterThanOrEqual("event_id", v) if asLong(v).isDefined =>
        lo = math.max(lo, asLong(v).get); true
      case GreaterThan("event_id", v) if asLong(v).isDefined =>
        lo = math.max(lo, asLong(v).get + 1); true
      case LessThan("event_id", v) if asLong(v).isDefined =>
        hi = math.min(hi, asLong(v).get); true
      case LessThanOrEqual("event_id", v) if asLong(v).isDefined =>
        hi = math.min(hi, asLong(v).get + 1); true
      case EqualTo("event_id", v) if asLong(v).isDefined =>
        lo = math.max(lo, asLong(v).get); hi = math.min(hi, asLong(v).get + 1); true
      case _ => false
    }
    pushed = accepted
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  // LIMIT n over the (filter-narrowed) interval truncates generation
  // itself: ids are emitted in order, so the first n of [lo,hi) are
  // exactly [lo, lo+n). FULLY pushed (not partial) — Spark drops its
  // own limit node. Spark only offers the pushdown when no residual
  // post-scan predicate precedes the limit, so this is always exact.
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, lo + limit)
    true
  }

  override def isPartiallyPushed: Boolean = false

  override def build(): Scan =
    if (pushedAgg.nonEmpty)
      new SynthAggScan(lo, math.max(lo, hi), pushedAgg)
    else new SynthScan(lo, math.max(lo, hi), slices, pruned, batchRows)
}

/** Closed-form answer scan for completely-pushed aggregates: one
  * partition, one row, zero generated rows whatever the interval
  * size. Empty interval: count 0, min/max NULL. */
private class SynthAggScan(lo: Long, hi: Long, kinds: Seq[String])
  extends Scan with Batch {
  override def readSchema(): StructType = StructType(
    kinds.zipWithIndex.map { case (k, i) =>
      StructField(s"agg$i", LongType, nullable = k != "count")
    })
  override def toBatch: Batch = this
  override def description(): String =
    s"SynthEvents AGG-PUSHDOWN range=[$lo,$hi) aggs=${kinds.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] =
    Array(SynthRange(lo, hi))

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      private val ks = kinds
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val r = p.asInstanceOf[SynthRange]
        val empty = r.hi <= r.lo
        val row = InternalRow.fromSeq(ks.map {
          case "count" => r.hi - r.lo
          case "min" => if (empty) null else r.lo
          case "max" => if (empty) null else r.hi - 1
        }.toIndexedSeq)
        new PartitionReader[InternalRow] {
          private var emitted = false
          override def next(): Boolean = { val go = !emitted; emitted = true; go }
          override def get(): InternalRow = row
          override def close(): Unit = ()
        }
      }
    }
}

private class SynthScan(lo: Long, hi: Long, slices: Int, schema: StructType,
    batchRows: Long)
  extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SynthMicroBatchStream(lo, hi, slices, schema, batchRows)
  override def description(): String =
    s"SynthEvents range=[$lo,$hi) slices=$slices cols=${schema.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    val per = math.max(1L, (n + slices - 1) / slices)
    Iterator.iterate(lo)(_ + per).takeWhile(_ < hi)
      .map(s => SynthRange(s, math.min(s + per, hi)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(schema)
}

private case class SynthRange(lo: Long, hi: Long) extends InputPartition

/** Streaming face of the generator: the id interval is the offset
  * axis. Each micro-batch admits `batchRows` more ids, so a bounded
  * run ends after ceil(n/batchRows) batches and the query drains —
  * the same offset/commit contract a Kafka-backed source implements,
  * checkpointable and exactly-once by construction (offsets are
  * deterministic row ranges; replaying [start, end) regenerates
  * identical rows). */
private class SynthMicroBatchStream(lo: Long, hi: Long, slices: Int,
    schema: StructType, batchRows: Long)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{Offset => SOffset, ReadLimit}

  override def initialOffset(): SOffset = SynthOffset(lo)

  // Admission is STATELESS: the engine hands back the current position
  // every trigger (SupportsAdmissionControl), so a restarted query —
  // a fresh stream instance — resumes from the checkpointed offset by
  // construction. (A mutable per-instance counter here restarts from
  // lo on recovery and either stalls or re-admits the whole interval,
  // which is exactly the bug class the restart spec pins.)
  override def latestOffset(start: SOffset, limit: ReadLimit): SOffset =
    SynthOffset(math.min(hi,
      start.asInstanceOf[SynthOffset].pos + math.max(1L, batchRows)))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def reportLatestOffset(): SOffset = SynthOffset(hi)

  // Only the admission-control overload is called when
  // SupportsAdmissionControl is implemented.
  override def latestOffset(): SOffset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-control entry point")

  override def deserializeOffset(json: String): SOffset =
    SynthOffset(json.trim.toLong)

  override def planInputPartitions(start: SOffset, end: SOffset): Array[InputPartition] = {
    val s = start.asInstanceOf[SynthOffset].pos
    val e = end.asInstanceOf[SynthOffset].pos
    val n = math.max(0L, e - s)
    if (n == 0) Array.empty
    else {
      val per = math.max(1L, (n + slices - 1) / slices)
      Iterator.iterate(s)(_ + per).takeWhile(_ < e)
        .map(x => SynthRange(x, math.min(x + per, e)): InputPartition)
        .toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(schema)

  override def commit(end: SOffset): Unit = ()
  override def stop(): Unit = ()
}

private case class SynthOffset(pos: Long)
  extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = pos.toString
}

private class SynthReaderFactory(schema: StructType)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[SynthRange]
    // Per-column generators resolved ONCE per partition from the pruned
    // schema: an unprojected column costs nothing per row.
    // event_type has 5 distinct values — intern them once per partition
    // (the old per-row "t"+mod concat + fromString was 3 allocations/row)
    lazy val etCache: Array[UTF8String] =
      Array.tabulate(5)(k => UTF8String.fromString("t" + k))
    val gens: Array[Long => Any] = schema.fieldNames.map {
      case "event_id" => (i: Long) => i
      case "user_id" => (i: Long) => SynthEventsSource.userId(i)
      // floorMod: i*7919 can wrap negative past ~1.16e15 ids (ADVICE
      // r16) — unreachable with the current non-negative ranges, but a
      // negative index must never throw where the old string render
      // worked
      case "event_type" => (i: Long) =>
        etCache(java.lang.Math.floorMod(i * 7919, 5).toInt)
      case "cents" => (i: Long) => SynthEventsSource.cents(i)
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    // The generator is the bench's highest-volume row loop (2e8 virtual
    // rows under q262's count() wrapper): the old
    // InternalRow.fromSeq(gens.map(_).toIndexedSeq) allocated a mapped
    // array + ArraySeq wrapper + toArray copy PER ROW (GC-bound at
    // 32 threads). A while-loop fill into the row's own array — and a
    // shared immutable empty row when every column is pruned — leaves
    // only the values themselves.
    if (gens.isEmpty)
      new PartitionReader[InternalRow] {
        private var i = r.lo - 1
        private val empty =
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array.empty[Any])
        override def next(): Boolean = { i += 1; i < r.hi }
        override def get(): InternalRow = empty
        override def close(): Unit = ()
      }
    else
      new PartitionReader[InternalRow] {
        private var i = r.lo - 1
        private val n = gens.length
        override def next(): Boolean = { i += 1; i < r.hi }
        override def get(): InternalRow = {
          val a = new Array[Any](n)
          var c = 0
          while (c < n) { a(c) = gens(c)(i); c += 1 }
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(a)
        }
        override def close(): Unit = ()
      }
  }
}
