package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 that REPORTS ITS PARTITIONING — the half of
  * storage-partitioned join (SPJ) that lives in the connector. The
  * table is deterministic synthetic data laid out in one input split
  * per key: split k holds exactly the rows whose join key is k, and
  * the scan advertises that as `KeyGroupedPartitioning(identity(k))`
  * with every split exposing its key via [[HasPartitionKey]].
  *
  * That report is what lets Spark plan a join between two such tables
  * with ZERO exchanges (q305): both sides are already clustered by the
  * join key at the STORAGE layer, so the join runs split-by-split —
  * at 100 TB this is the Iceberg/Delta bucketed-table join, the
  * difference between shuffling both fact tables and shuffling
  * nothing. Requires `spark.sql.sources.v2.bucketing.enabled=true`.
  *
  * Row formulas are pure BIGINT functions of (k, i) so the DuckDB
  * oracle regenerates the identical relation from range():
  * value(k, i) = (k * m1 + i * m2) % m3, with the multipliers taken
  * from reader options.
  *
  * Usage: spark.read.format("graft.sources.KeyedSource")
  *   .option("keys", 8).option("rowsPerKey", 50)
  *   .option("m1", 7919).option("m2", 104729).option("m3", 100000)
  *   .load()  // schema: (k BIGINT, v BIGINT)
  */
class KeyedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KeyedSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    def opt(name: String, dflt: Long): Long =
      Option(properties.get(name)).map(_.toLong).getOrElse(dflt)
    new KeyedTable(
      keys = opt("keys", 8).toInt,
      rowsPerKey = opt("rowsPerKey", 50),
      m1 = opt("m1", 7919), m2 = opt("m2", 104729), m3 = opt("m3", 100000))
  }
}

object KeyedSource {
  val schema: StructType = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", LongType, nullable = false)))
}

private class KeyedTable(
    keys: Int, rowsPerKey: Long, m1: Long, m2: Long, m3: Long)
  extends Table with SupportsRead {
  override def name(): String = s"keyed($keys x $rowsPerKey)"
  override def schema(): StructType = KeyedSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan =
        new KeyedScan(keys, rowsPerKey, m1, m2, m3)
    }
}

private class KeyedScan(
    keys: Int, rowsPerKey: Long, m1: Long, m2: Long, m3: Long)
  extends Scan with Batch with SupportsReportPartitioning {

  override def readSchema(): StructType = KeyedSource.schema
  override def toBatch: Batch = this

  /** The storage-layout contract: rows are clustered by identity(k)
    * into exactly `keys` splits. */
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.identity("k")), keys)

  override def planInputPartitions(): Array[InputPartition] =
    (0 until keys).map(k =>
      KeyedPartition(k, rowsPerKey, m1, m2, m3): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val kp = p.asInstanceOf[KeyedPartition]
        new PartitionReader[InternalRow] {
          private var i = -1L
          private val kBoxed: Any = kp.k.toLong // constant per split
          override def next(): Boolean = { i += 1; i < kp.rowsPerKey }
          override def get(): InternalRow = {
            // direct 2-slot fill — InternalRow(...) varargs built a
            // Seq + copy per generated row
            val a = new Array[Any](2)
            a(0) = kBoxed
            a(1) = (kp.k * kp.m1 + i * kp.m2) % kp.m3
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(a)
          }
          override def close(): Unit = ()
        }
      }
    }
}

/** One split per key; `partitionKey` is how SPJ knows which split on
  * each side lines up with which. */
private case class KeyedPartition(
    k: Int, rowsPerKey: Long, m1: Long, m2: Long, m3: Long)
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(k.toLong)
}
