package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 WRITE path: a CSV sink with an atomic manifest
  * commit — the connector-side half of the source story
  * (SynthEventsSource covers reads). The point is the two-phase commit
  * protocol every production sink implements:
  *
  *  - each task's [[DataWriter]] streams rows to a UNIQUELY-NAMED temp
  *    file under `_tmp/` and returns (file, rows, checksum) as its
  *    commit message — task retries/speculation produce distinct temp
  *    files, never clobbering each other;
  *  - the driver's [[BatchWrite.commit]] runs once with the messages of
  *    the WINNING task attempts only: it moves exactly those files into
  *    place and writes `manifest.json` (per-file rows/checksum + total)
  *    LAST, so a reader that requires the manifest sees either the
  *    complete committed write or nothing;
  *  - abort deletes the temp dir — losers and failures leave no
  *    visible state.
  *
  * Values are written as toString CSV (exercised with integer/string
  * columns); checksum is an order-independent sum so file-internal row
  * order never matters.
  *
  * Usage: df.write.format("graft.sources.ManifestSink")
  *   .option("path", dir).mode("append").save()
  */
class ManifestSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // write-only: schema comes from the dataframe

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("ManifestSink requires option 'path'"))
    new ManifestTable(path, schema)
  }
}

private class ManifestTable(path: String, writeSchema: StructType)
  extends Table with SupportsWrite {
  override def name(): String = s"manifest_sink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = {
        val t = doTruncate
        new Write {
          override def toBatch: BatchWrite =
            new ManifestBatchWrite(path, info.schema(), t)
        }
      }
    }
}

private case class ManifestCommit(file: String, rows: Long, checksum: Long)
  extends WriterCommitMessage

private class ManifestBatchWrite(path: String, schema: StructType,
    truncate: Boolean)
  extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new ManifestWriterFactory(path, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new java.io.File(path)
    dir.mkdirs()
    // Overwrite (SupportsTruncate): previous committed files vanish
    // with the old manifest. Append: the old manifest's entries are
    // carried into the new one, so the manifest ALWAYS describes the
    // full committed content — readers never need to list the dir.
    val previous: Seq[(String, Long, Long)] =
      if (truncate) {
        Option(dir.listFiles()).foreach(_.filter(f =>
          f.getName.startsWith("part-") || f.getName == "manifest.json")
          .foreach(_.delete()))
        Nil
      } else {
        val mf = new java.io.File(dir, "manifest.json")
        if (!mf.exists()) Nil
        else {
          val txt = new String(java.nio.file.Files.readAllBytes(mf.toPath), "UTF-8")
          """\{"file":"([^"]+)","rows":(\d+),"checksum":(-?\d+)\}""".r
            .findAllMatchIn(txt)
            .map(m => (m.group(1), m.group(2).toLong, m.group(3).toLong))
            .toSeq
        }
      }
    val commits = messages.map(_.asInstanceOf[ManifestCommit])
    commits.foreach { c =>
      java.nio.file.Files.move(
        java.nio.file.Paths.get(path, "_tmp", c.file),
        java.nio.file.Paths.get(path, c.file),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    val all = previous ++ commits.map(c => (c.file, c.rows, c.checksum))
    val manifest = all.sortBy(_._1).map { case (f, r, cs) =>
      s"""{"file":"$f","rows":$r,"checksum":$cs}"""
    }.mkString("[", ",", "]")
    val total = all.map(_._2).sum
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "manifest.json"),
      s"""{"total_rows":$total,"files":$manifest}""")
    // losers' temp files (failed/speculative attempts) die here
    val tmp = new java.io.File(dir, "_tmp")
    Option(tmp.listFiles()).foreach(_.foreach(_.delete()))
    tmp.delete()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val tmp = new java.io.File(path, "_tmp")
    Option(tmp.listFiles()).foreach(_.foreach(_.delete()))
    tmp.delete()
  }
}

private class ManifestWriterFactory(path: String, schema: StructType)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val name =
        f"part-$partitionId%05d-$taskId-${java.util.UUID.randomUUID()}.csv"
      private val tmpDir = new java.io.File(path, "_tmp")
      tmpDir.mkdirs()
      private val out = new java.io.PrintWriter(
        new java.io.File(tmpDir, name), "UTF-8")
      private var rows = 0L
      private var checksum = 0L

      override def write(r: InternalRow): Unit = {
        val vals = schema.fields.zipWithIndex.map { case (f, i) =>
          if (r.isNullAt(i)) ""
          else f.dataType match {
            case LongType => r.getLong(i).toString
            case IntegerType => r.getInt(i).toString
            case StringType => r.getUTF8String(i).toString
            case DoubleType => r.getDouble(i).toString
            case dt => r.get(i, dt).toString
          }
        }
        // order-independent file checksum: sum of per-row line hashes
        val line = vals.mkString(",")
        checksum += line.hashCode.toLong
        rows += 1
        out.println(line)
      }

      override def commit(): WriterCommitMessage = {
        out.close()
        ManifestCommit(name, rows, checksum)
      }

      override def abort(): Unit = {
        out.close()
        new java.io.File(tmpDir, name).delete()
      }

      override def close(): Unit = out.close()
    }
}
