package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.HadoopReadOptions
import org.apache.parquet.column.ColumnDescriptor
import org.apache.parquet.column.ColumnReader
import org.apache.parquet.column.impl.ColumnReadStoreImpl
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.{Converter, GroupConverter, PrimitiveConverter}
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.types._

/** Batched columnar decode for the manifest connector's parquet files.
  *
  * The round-15 read path materialized one parquet-java `Group` per row
  * (SimpleGroup allocation, a name→index hash lookup per field access,
  * boxed values) — row-at-a-time work on the connector's DEFAULT format.
  * This reader walks the projected columns' chunks directly through the
  * public column-reader API instead: per row group, each column is
  * decoded in ONE tight loop into a primitive array (4096-row batches),
  * and the partition reader serves rows straight from the arrays by
  * index. No per-row objects, no name lookups, no boxing of numeric
  * columns — the same batch-per-column shape Spark's own vectorized
  * parquet reader uses, over the row-group split boundaries the
  * manifest already plans (q438).
  *
  * Semantics are unchanged by construction: the same projection
  * MessageType, the same byte-midpoint row-group range contract, the
  * same definition-level null handling the Group API performed
  * internally — only the materialization is columnar.
  */
private[sources] final class ManifestParquetBatchReader(
    file: Path, names: Array[String], types: Array[DataType],
    conf: Configuration, range: Option[(Long, Long)])
  extends AutoCloseable {

  import ManifestParquetBatchReader._

  private val projection: MessageType =
    ManifestParquet.messageType(StructType(names.indices.map(i =>
      StructField(names(i), types(i)))))

  private val reader: ParquetFileReader = {
    val b = HadoopReadOptions.builder(conf, file)
    range.foreach { case (s, e) => b.withRange(s, e) }
    ParquetFileReader.open(HadoopInputFile.fromPath(file, conf), b.build())
  }
  if (names.nonEmpty) reader.setRequestedSchema(projection)
  private val createdBy: String =
    reader.getFooter.getFileMetaData.getCreatedBy

  private val nCols = names.length
  // 0=long-backed (LONG/TIMESTAMP/DECIMAL<=18), 1=int, 2=double,
  // 3=boolean, 4=string(binary)
  private val kinds: Array[Int] = types.map {
    case LongType | TimestampType => 0
    case _: DecimalType => 0
    case IntegerType => 1
    case DoubleType => 2
    case BooleanType => 3
    case StringType => 4
    case dt => throw new UnsupportedOperationException(
      s"ManifestParquetBatch: unsupported column type $dt")
  }

  // column-major batch storage, allocated once and reused
  private val nullsCol: Array[Array[Boolean]] =
    Array.fill(nCols)(new Array[Boolean](BatchRows))
  private val longCol: Array[Array[Long]] =
    kinds.map(k => if (k == 0) new Array[Long](BatchRows) else null)
  private val intCol: Array[Array[Int]] =
    kinds.map(k => if (k == 1) new Array[Int](BatchRows) else null)
  private val dblCol: Array[Array[Double]] =
    kinds.map(k => if (k == 2) new Array[Double](BatchRows) else null)
  private val boolCol: Array[Array[Boolean]] =
    kinds.map(k => if (k == 3) new Array[Boolean](BatchRows) else null)
  private val strCol: Array[Array[Array[Byte]]] =
    kinds.map(k => if (k == 4) new Array[Array[Byte]](BatchRows) else null)

  private var columnReaders: Array[ColumnReader] = _
  private var maxDefs: Array[Int] = _
  private var rowsLeftInGroup = 0L
  // zero-projection mode (metadata-only rows, e.g. `_mf_pos` under no
  // filters): serve row counts straight from the (range-filtered)
  // footer blocks — nothing to decode
  private val rowCountsOnly: Iterator[Long] =
    if (names.nonEmpty) Iterator.empty
    else {
      import scala.jdk.CollectionConverters._
      reader.getRowGroups.asScala.iterator.map(_.getRowCount)
    }

  /** Decode the next batch; returns its row count, or -1 at EOF. */
  def loadNextBatch(): Int = {
    if (nCols == 0) {
      while (rowsLeftInGroup == 0L) {
        if (!rowCountsOnly.hasNext) return -1
        rowsLeftInGroup = rowCountsOnly.next()
      }
      val n = math.min(BatchRows.toLong, rowsLeftInGroup).toInt
      rowsLeftInGroup -= n
      return n
    }
    while (rowsLeftInGroup == 0L) {
      val pages = reader.readNextRowGroup()
      if (pages == null) return -1
      rowsLeftInGroup = pages.getRowCount
      if (rowsLeftInGroup > 0L) {
        val store = new ColumnReadStoreImpl(
          pages, NoopGroupConverter, projection, createdBy)
        import scala.jdk.CollectionConverters._
        val descs = projection.getColumns.asScala
        columnReaders = descs.map(store.getColumnReader).toArray
        maxDefs = descs.map(_.getMaxDefinitionLevel).toArray
      }
    }
    val n = math.min(BatchRows.toLong, rowsLeftInGroup).toInt
    var c = 0
    while (c < nCols) {
      val cr = columnReaders(c)
      val maxDef = maxDefs(c)
      val nulls = nullsCol(c)
      kinds(c) match {
        case 0 =>
          val out = longCol(c)
          var i = 0
          while (i < n) {
            if (cr.getCurrentDefinitionLevel < maxDef) nulls(i) = true
            else { nulls(i) = false; out(i) = cr.getLong }
            cr.consume(); i += 1
          }
        case 1 =>
          val out = intCol(c)
          var i = 0
          while (i < n) {
            if (cr.getCurrentDefinitionLevel < maxDef) nulls(i) = true
            else { nulls(i) = false; out(i) = cr.getInteger }
            cr.consume(); i += 1
          }
        case 2 =>
          val out = dblCol(c)
          var i = 0
          while (i < n) {
            if (cr.getCurrentDefinitionLevel < maxDef) nulls(i) = true
            else { nulls(i) = false; out(i) = cr.getDouble }
            cr.consume(); i += 1
          }
        case 3 =>
          val out = boolCol(c)
          var i = 0
          while (i < n) {
            if (cr.getCurrentDefinitionLevel < maxDef) nulls(i) = true
            else { nulls(i) = false; out(i) = cr.getBoolean }
            cr.consume(); i += 1
          }
        case 4 =>
          val out = strCol(c)
          var i = 0
          while (i < n) {
            if (cr.getCurrentDefinitionLevel < maxDef) nulls(i) = true
            else { nulls(i) = false; out(i) = cr.getBinary.getBytes }
            cr.consume(); i += 1
          }
      }
      c += 1
    }
    rowsLeftInGroup -= n
    n
  }

  def isNull(c: Int, i: Int): Boolean = nullsCol(c)(i)
  def getLong(c: Int, i: Int): Long = longCol(c)(i)
  def getInt(c: Int, i: Int): Int = intCol(c)(i)
  def getDouble(c: Int, i: Int): Double = dblCol(c)(i)
  def getBoolean(c: Int, i: Int): Boolean = boolCol(c)(i)
  def getBytes(c: Int, i: Int): Array[Byte] = strCol(c)(i)

  /** The row's raw string rendering for column `c` — byte-identical to
    * the Group-API `ManifestParquet.rawString` (and so to the writer's
    * canonical CSV line): filters and `_mf_linehash` hash the same
    * text. Null when unset. */
  def rawString(c: Int, i: Int): String =
    if (nullsCol(c)(i)) null
    else kinds(c) match {
      case 0 => types(c) match {
        case d: DecimalType =>
          java.math.BigDecimal.valueOf(longCol(c)(i), d.scale).toPlainString
        case _ => longCol(c)(i).toString
      }
      case 1 => intCol(c)(i).toString
      case 2 => dblCol(c)(i).toString
      case 3 => boolCol(c)(i).toString
      case 4 => new String(strCol(c)(i), java.nio.charset.StandardCharsets.UTF_8)
    }

  override def close(): Unit = reader.close()
}

private[sources] object ManifestParquetBatchReader {
  /** Rows decoded per batch — large enough to amortize the per-column
    * loop setup, small enough to keep the working set in cache. */
  val BatchRows = 4096

  /** ColumnReadStoreImpl needs a record converter to locate a
    * PrimitiveConverter per column; values are pulled through the typed
    * getters, so a no-op converter suffices. */
  private object NoopGroupConverter extends GroupConverter {
    private val prim = new PrimitiveConverter {}
    override def getConverter(fieldIndex: Int): Converter = prim
    override def start(): Unit = ()
    override def end(): Unit = ()
  }
}
