package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** DELTA-BASED row-level operations for manifest tables — the DSv2
  * machinery behind pure-SQL `MERGE INTO`, `UPDATE`, and arbitrary-
  * predicate `DELETE` on a [[ManifestCatalog]] table (merge-on-read):
  *
  *  - Spark's row-level rewrite rules plan a `WriteDelta` over a scan
  *    of THIS operation's pinned snapshot; each matched row arrives at
  *    the [[ManifestDeltaWriter]] as a delete (row id = the connector's
  *    positional identity `(_mf_file, _mf_pos)`, metadata = the row's
  *    line hash) and/or an insert (the full new row);
  *  - deletes become POSITIONAL DELETE VECTOR files — the same
  *    (dataFile, byteOffset, lineHash) rows [[ManifestMaintenance]]
  *    writes — and inserts stream through the sink's own fan-out
  *    writer (identity-partitioned tables keep their SPJ layout);
  *  - the driver commit publishes BOTH in ONE manifest version under
  *    `_commit.lock`, so readers see the merge atomically; no data
  *    file is ever rewritten ([[ManifestMaintenance.compact]] later
  *    applies the vectors physically, conservation-checked via the
  *    lineHash term each delete carries).
  *
  * SNAPSHOT ISOLATION with loud conflict aborts: the operation pins
  * the table's latest committed version at creation, scans exactly
  * that version, and the commit re-verifies under the lock that no
  * other commit landed since — positions scanned against an older
  * snapshot must never be applied to a newer one (a concurrent
  * append's rows would silently escape the merge; a concurrent
  * compaction would invalidate every byte offset). Updates are
  * represented as delete + reinsert, so the writer needs only two
  * verbs and an updated row moves files like any other insert.
  */
private[graft] class ManifestRowLevelOperation(
    dir: String, tableSchema: StructType,
    cmd: RowLevelOperation.Command, partitionBy: Option[String],
    fmt: String = ManifestFormat.Csv)
  extends SupportsDelta {

  /** The snapshot this whole operation reads and must still be the
    * head at commit time (0 = empty table, no manifest yet). */
  private[sources] val snapshotV: Long = ManifestRead.latestVersion(dir)

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ManifestReadTable(dir,
      if (snapshotV > 0) Some(snapshotV) else None, tableSchema)
      .newScanBuilder(options)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new ManifestDeltaWrite(dir, info.schema(), snapshotV, partitionBy,
          fmt)
    }

  /** Positional row identity — the pair every delete vector keys on. */
  override def rowId(): Array[NamedReference] =
    Array(Expressions.column("_mf_file"), Expressions.column("_mf_pos"))

  /** The deleted row's line hash rides along as metadata: it is the
    * exact term compaction's checksum-conservation guard subtracts. */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column("_mf_linehash"))

  /** UPDATE = DELETE + REINSERT: the two verbs the merge-on-read
    * format has (a new value always lands in a new file). */
  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def description(): String =
    s"ManifestRowLevelOperation($cmd, $dir@v$snapshotV)"
}

private class ManifestDeltaWrite(dir: String, dataSchema: StructType,
    snapshotV: Long, partitionBy: Option[String],
    fmt: String = ManifestFormat.Csv)
  extends DeltaWrite {
  override def toBatch: DeltaBatchWrite =
    new ManifestDeltaBatchWrite(dir, dataSchema, snapshotV, partitionBy, fmt)
  override def description(): String = s"ManifestDeltaWrite($dir@v$snapshotV)"
}

private class ManifestDeltaBatchWrite(dir: String, dataSchema: StructType,
    snapshotV: Long, partitionBy: Option[String],
    fmt: String = ManifestFormat.Csv)
  extends DeltaBatchWrite {

  private val writeId = java.util.UUID.randomUUID().toString
  private def tmpDirName = s"_tmp-$writeId"

  private val hadoopConf = new SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DeltaWriterFactory =
    new ManifestDeltaWriterFactory(dir, writeId, dataSchema, hadoopConf,
      partitionBy, fmt)

  /** Atomic merge publish (mirrors ManifestMaintenance.mutate): verify
    * the pinned snapshot is still the head, move delete vectors and
    * insert files in, publish one manifest version carrying the
    * previous entries verbatim (cols/stats/pv — file skipping and SPJ
    * must survive DML) plus the new ones. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val table = new Path(dir)
    val fs = table.getFileSystem(hadoopConf.value)
    val tmp = new Path(table, tmpDirName)
    val commits = messages.toSeq.collect {
      case m: ManifestDeltaCommit => m
    }
    val dataCommits = commits.flatMap(_.data).filter(_.rows > 0)
    val dvCommits = commits.flatMap(_.dvs).filter(_.rows > 0)
    if (dataCommits.isEmpty && dvCommits.isEmpty) {
      fs.delete(tmp, true)
      return
    }
    // same lock protocol as every other publisher (ManifestLock): a
    // crashed driver's leftover lock is taken over after the staleness
    // bound instead of permanently blocking all SQL DML on the table
    try ManifestLock.withLock(fs, table, s"row-level-$writeId",
      "ManifestRowLevel") {
      // snapshot-isolation conflict check: ANY commit since this
      // operation's scan snapshot invalidates it — an append's rows
      // escaped the merge condition, a compaction/delete moved byte
      // offsets. Abort loudly; the statement can simply be retried.
      val headV = ManifestRead.latestVersion(dir)
      if (headV != snapshotV)
        throw new IllegalStateException(
          s"ManifestRowLevel: concurrent commit at $dir (snapshot v$snapshotV " +
            s"is no longer the head v$headV) — the merge read a stale " +
            "snapshot; retry the statement")
      val (prevEntries, prevDvs, prevEpochs) =
        if (snapshotV == 0) (Nil, Nil, Map.empty[String, Long])
        else {
          val txt = ManifestRead.manifestText(dir, "manifest.json")
          (ManifestRead.entriesOfText(txt), ManifestRead.dvsOfText(txt),
            ManifestRead.streamEpochs(txt))
        }
      // move winners into place: insert files keep their unique names,
      // dv stage files take committed dv- names
      dataCommits.foreach { c =>
        if (!fs.rename(new Path(tmp, c.file), new Path(table, c.file)))
          throw new java.io.IOException(
            s"ManifestRowLevel: failed to move insert file ${c.file}")
      }
      val movedDvs = dvCommits.zipWithIndex.map { case (c, i) =>
        val dvName = s"dv-$writeId-$i.csv"
        if (!fs.rename(new Path(tmp, c.file), new Path(table, dvName)))
          throw new java.io.IOException(
            s"ManifestRowLevel: failed to move delete vector ${c.file}")
        (dvName, c.rows, c.checksum)
      }
      val allEntries = prevEntries ++ dataCommits.map(c =>
        ManifestEntry(c.file, c.rows, c.checksum,
          Option(c.cols).filter(_.nonEmpty),
          Option(c.stats).filter(_.nonEmpty), c.pv, c.pt,
          Some(c.bytes).filter(_ >= 0), Option(c.rgs).filter(_.nonEmpty),
          Option(c.pvs).filter(_.nonEmpty), Option(c.pts).filter(_.nonEmpty)))
      val allDvs = prevDvs ++ movedDvs
      val body = s"""{"total_rows":${allEntries.map(_.rows).sum},""" +
        s""""files":${allEntries.sortBy(_.file).map(ManifestRead.render)
          .mkString("[", ",", "]")}""" +
        (if (allDvs.isEmpty) ""
         else allDvs.sortBy(_._1).map { case (n, r, c) =>
           s"""{"dv":"$n","rows":$r,"checksum":$c}"""
         }.mkString(""","deletes":[""", ",", "]")) +
        ManifestRead.renderEpochs(prevEpochs) + "}"
      // write-complete-then-swap, current + immutable numbered version
      val nextV = snapshotV + 1
      val mTmp = new Path(tmp, "manifest.json.new")
      val out = fs.create(mTmp, true)
      try out.write(body.getBytes("UTF-8")) finally out.close()
      fs.delete(new Path(table, "manifest.json"), false)
      if (!fs.rename(mTmp, new Path(table, "manifest.json")))
        throw new java.io.IOException(
          s"ManifestRowLevel: failed to publish manifest at $dir")
      val vTmp = new Path(table, s"_manifest-v$nextV.tmp")
      val vOut = fs.create(vTmp, true)
      try vOut.write(body.getBytes("UTF-8")) finally vOut.close()
      if (!fs.rename(vTmp, new Path(table, s"manifest-v$nextV.json")))
        throw new java.io.IOException(
          s"ManifestRowLevel: failed to publish manifest-v$nextV at $dir")
      fs.delete(tmp, true)
    } catch { case e: Throwable =>
      fs.delete(tmp, true)
      throw e
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(dir).getFileSystem(hadoopConf.value)
    fs.delete(new Path(new Path(dir), tmpDirName), true)
  }
}

/** Data-file commits (inserts, via the sink's own fan-out writer) plus
  * delete-vector commits of one task. */
private[graft] case class ManifestDeltaCommit(
    data: Seq[ManifestFileCommit], dvs: Seq[ManifestFileCommit])
  extends WriterCommitMessage

private class ManifestDeltaWriterFactory(dir: String, writeId: String,
    dataSchema: StructType, hadoopConf: SerializableConfiguration,
    partitionBy: Option[String], fmt: String = ManifestFormat.Csv)
  extends DeltaWriterFactory {

  override def createWriter(partitionId: Int,
      taskId: Long): DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      // inserts ride the sink's own fan-out DataWriter (stats, Blooms,
      // string bounds, identity-partition pv fan-out — everything a
      // plain INSERT gets, updates get too)
      private val insertWriter =
        new ManifestWriterFactory(dir, writeId, dataSchema, hadoopConf,
          partitionBy, fmt).createWriter(partitionId, taskId)
      private val fs = new Path(dir).getFileSystem(hadoopConf.value)
      private val tmpDir = new Path(new Path(dir), s"_tmp-$writeId")
      // one positional delete-vector stage file per task, lazily
      // created; rows are the (dataFile, byteOffset, lineHash) lines
      // every dv reader/conservation guard expects
      private var dvName: String = _
      private var dvOut: java.io.PrintWriter = _
      private var dvRows = 0L
      private var dvChecksum = 0L

      override def delete(metadata: InternalRow, id: InternalRow): Unit = {
        if (dvOut == null) {
          fs.mkdirs(tmpDir)
          dvName =
            f"dvstage-$partitionId%05d-$taskId-${java.util.UUID.randomUUID()}.csv"
          dvOut = new java.io.PrintWriter(new java.io.OutputStreamWriter(
            fs.create(new Path(tmpDir, dvName), true), "UTF-8"))
        }
        // id = (_mf_file, _mf_pos) in rowId() order; metadata =
        // (_mf_linehash). File names are the sink's own (no commas or
        // quotes), so the line needs no CSV escaping.
        val line =
          s"${id.getUTF8String(0)},${id.getLong(1)},${metadata.getLong(0)}"
        dvOut.print(line)
        dvOut.print('\n')
        dvChecksum += line.hashCode.toLong
        dvRows += 1
      }

      override def insert(row: InternalRow): Unit = insertWriter.write(row)

      /** Reinsert = the insert half of an update (metadata of the OLD
        * row is irrelevant to where the NEW value lands). */
      override def reinsert(metadata: InternalRow, row: InternalRow): Unit =
        insert(row)

      override def update(metadata: InternalRow, id: InternalRow,
          row: InternalRow): Unit =
        throw new IllegalStateException(
          "ManifestRowLevel: updates are represented as delete+reinsert " +
            "(representUpdateAsDeleteAndInsert=true); update() must not be called")

      override def commit(): WriterCommitMessage = {
        if (dvOut != null) dvOut.close()
        val dataFiles = insertWriter.commit() match {
          case ManifestCommit(files) => files
          case other => throw new IllegalStateException(
            s"ManifestRowLevel: unexpected insert commit $other")
        }
        ManifestDeltaCommit(dataFiles,
          if (dvRows > 0)
            Seq(ManifestFileCommit(dvName, dvRows, dvChecksum))
          else Nil)
      }

      override def abort(): Unit = {
        if (dvOut != null) {
          dvOut.close()
          fs.delete(new Path(tmpDir, dvName), false)
        }
        insertWriter.abort()
      }

      override def close(): Unit = {
        if (dvOut != null) dvOut.close()
        insertWriter.close()
      }
    }
}
