package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.{ParquetReader, ParquetWriter}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.types._

/** Parquet data files for the manifest connector (`format=parquet`),
  * via the public parquet-java Group API — Spark's own parquet
  * machinery is a file-source implementation detail this DSv2
  * connector can't reach into, and the Group API is exactly the
  * footer/column-chunk surface the format exposes to every engine.
  *
  * Columnar data files are the connector's 100 TB answer: snappy +
  * dictionary/RLE cut raw bytes ~3-10× vs CSV rows, and a pruned read
  * decodes ONLY the requested columns' chunks instead of tokenizing
  * every field of every row. The manifest layer is untouched: entries,
  * stats, Blooms, delete vectors, checksums, and the compaction
  * conservation guard are all defined over the row's CANONICAL CSV
  * RENDERING, which both formats compute identically at write time —
  * so a table can mix formats, and a format-converting compaction
  * passes the same row/checksum conservation proof.
  *
  * Row identity for delete vectors: `_mf_pos` is the record's ROW
  * ORDINAL in a parquet file (byte offsets are meaningless across
  * column chunks); each file's positions live in their own namespace,
  * so CSV offsets and parquet ordinals never meet. Parquet files are
  * planned whole-file (row-group split is the scale follow-up); the
  * bin-packing compactor already bounds file sizes.
  */
private[sources] object ManifestParquet {

  /** Parquet schema for the connector's column types. All fields
    * optional (nullable) — the manifest's null-count stats, not the
    * parquet repetition level, drive pruning decisions. */
  def messageType(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      f.dataType match {
        case LongType => b.addField(Types.optional(INT64).named(f.name))
        case IntegerType => b.addField(Types.optional(INT32).named(f.name))
        case DoubleType => b.addField(Types.optional(DOUBLE).named(f.name))
        case StringType => b.addField(Types.optional(BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(f.name))
        case dt => throw new UnsupportedOperationException(
          s"ManifestParquet: unsupported column type $dt")
      }
    }
    b.named("graft_manifest_row")
  }

  def writer(path: Path, schema: StructType,
      conf: Configuration): (ParquetWriter[Group], SimpleGroupFactory) = {
    val mt = messageType(schema)
    (ExampleParquetWriter.builder(path)
      .withConf(conf)
      .withType(mt)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build(),
      new SimpleGroupFactory(mt))
  }

  /** Row-iterating reader over `projection` (a subset of the file's
    * columns — parquet decodes only those chunks). */
  def reader(file: Path, projection: MessageType,
      conf: Configuration): ParquetReader[Group] = {
    val c = new Configuration(conf)
    c.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
      projection.toString)
    ParquetReader.builder(new GroupReadSupport(), file).withConf(c).build()
  }

  /** Group field → raw string (the same rendering the writer hashed),
    * null when unset. */
  def rawString(g: Group, name: String, dt: DataType): String = {
    if (g.getType.containsField(name) &&
      g.getFieldRepetitionCount(name) > 0) {
      dt match {
        case LongType => g.getLong(name, 0).toString
        case IntegerType => g.getInteger(name, 0).toString
        case DoubleType => g.getDouble(name, 0).toString
        case StringType => g.getString(name, 0)
        case other => throw new UnsupportedOperationException(
          s"ManifestParquet: unsupported read type $other")
      }
    } else null
  }
}
