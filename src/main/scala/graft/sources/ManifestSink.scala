package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
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
  *    file under a PER-JOB temp dir (`_tmp-<writeId>/`) and returns
  *    (file, rows, checksum) as its commit message — task retries /
  *    speculation produce distinct temp files, never clobbering each
  *    other, and concurrent jobs never share a temp dir;
  *  - the driver's [[BatchWrite.commit]] runs once with the messages of
  *    the WINNING task attempts only: it moves exactly those files into
  *    place and writes `manifest.json` (per-file rows/checksum + total)
  *    LAST, so a reader that requires the manifest sees either the
  *    complete committed write or nothing;
  *  - abort deletes the job's temp dir — losers and failures leave no
  *    visible state.
  *
  * All I/O goes through the Hadoop [[FileSystem]] API, so the path may
  * be any Hadoop-visible filesystem (file:/, hdfs:/, s3a:/ …) shared
  * by driver and executors — executors resolve the filesystem from the
  * cluster's default Hadoop configuration. Concurrent appends to the
  * same path are serialized by an exclusive `_commit.lock` created
  * atomically (create-no-overwrite) around the manifest
  * read-merge-write; a second committer arriving while the lock is
  * held FAILS LOUDLY rather than silently losing the other commit's
  * manifest entries. The lock body records (timestamp, writeId); a lock
  * older than 10 minutes — a crashed driver, since commits take
  * seconds — is broken automatically so the path self-heals.
  * The manifest replace itself is delete-then-rename: readers
  * racing a commit can observe a missing manifest for an instant, but
  * never a torn one.
  *
  * Rows are CSV: a field containing a comma, quote, CR/LF, or
  * backslash is wrapped in double quotes with `"` → `\"`, `\` → `\\`,
  * and CR/LF → the two-char escapes `\r`/`\n` (one record per physical
  * line, always — the paired ManifestSource reads line-wise and
  * round-trips arbitrary string data exactly). Checksum is an
  * order-independent sum so file-internal row order never matters.
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

private[graft] object ManifestSink {
  /** Field encoding (quote `"`, escape `\`). CR/LF are escaped as the
    * two-char sequences `\r`/`\n` so every record stays ONE physical
    * line — the reader scans line-by-line, and an embedded newline
    * written literally would tear the record (and fire the manifest
    * row-count tamper guard on perfectly valid data). */
  def csvField(v: String): String =
    if (v.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r' || c == '\\'))
      "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\r", "\\r") + "\""
    else v

  /** The lock at `lock` must still carry exactly `myBody` — a
    * different (or unreadable) body means a racing committer clobbered
    * our freshly-created lock after reading a stale view of its
    * predecessor. Throws IllegalStateException; the caller must then
    * abort WITHOUT deleting the (now foreign) lock. */
  private[graft] def verifyLockOwnership(
      f: FileSystem, lock: Path, myBody: String, path: String): Unit = {
    val onDisk =
      try {
        val in = f.open(lock)
        try {
          // loop to fill the window — a short read (legal for any
          // InputStream) would truncate the body and fail the
          // ownership compare in the SAFE direction, but fix it
          // anyway so a real owner never aborts spuriously
          val buf = new Array[Byte](256)
          var off = 0
          var n = in.read(buf, 0, buf.length)
          while (n > 0) { off += n; n = in.read(buf, off, buf.length - off) }
          if (off > 0) new String(buf, 0, off, "UTF-8") else ""
        } finally in.close()
      } catch { case _: java.io.IOException => "" }
    if (onDisk != myBody)
      throw new IllegalStateException(
        s"ManifestSink: lost the commit lock at $path to a concurrent " +
          s"committer [$onDisk] — aborting this commit; retry it")
  }

  private[graft] def readFully(in: java.io.InputStream): String = {
    try {
      val buf = new Array[Byte](256)
      var off = 0
      var n = in.read(buf, 0, buf.length)
      while (n > 0) { off += n; n = in.read(buf, off, buf.length - off) }
      if (off > 0) new String(buf, 0, off, "UTF-8") else ""
    } finally in.close()
  }
}

/** Exclusive `_commit.lock` acquisition shared by EVERY manifest
  * publisher — batch/streaming sink, row-level DML, maintenance. One
  * protocol everywhere: create-exclusive with an `(epoch-millis owner)`
  * body; a lock older than the 10-minute staleness bound (a crashed
  * driver — commits take seconds, not minutes) is broken automatically
  * via an atomic RENAME to an owner-unique tombstone (of two committers
  * that both read the same stale body, exactly one wins the rename and
  * re-creates the lock; the loser's rename fails — source gone — and it
  * fails loudly; an unconditional delete here would be check-then-act:
  * the loser could delete the winner's FRESH lock and both would enter
  * the manifest read-merge-write silently); a FRESH lock still fails
  * loudly with its age and owner in the message. After creating the
  * lock, ownership is re-verified (second line of defense behind the
  * atomic rename): if a racing committer with a stale view clobbered
  * ours between create and verify, the commit aborts BEFORE touching
  * the manifest and leaves the clobberer's lock alone. */
private[graft] object ManifestLock {
  private val staleMs = 10 * 60 * 1000L

  /** Runs `body` while holding `dir/_commit.lock`. `owner` must be
    * unique per attempt (a writeId) — it tags the lock body for
    * diagnostics and the takeover tombstone for atomicity. `what`
    * prefixes error messages. The lock is removed on exit only while
    * still owned (never deletes a foreign lock). */
  def withLock[T](f: FileSystem, dir: Path, owner: String, what: String)
      (body: => T): T = {
    f.mkdirs(dir)
    val lock = new Path(dir, "_commit.lock")
    def tryLock(): java.io.OutputStream =
      try f.create(lock, false) catch { case _: java.io.IOException => null }
    var lockStream = tryLock()
    if (lockStream == null) {
      val lockBody =
        try ManifestSink.readFully(f.open(lock))
        catch { case _: java.io.IOException => "" }
      val heldSince = lockBody.split(' ').headOption.flatMap(s =>
        scala.util.Try(s.toLong).toOption)
      val ageMs = heldSince.map(System.currentTimeMillis() - _)
      if (ageMs.exists(_ > staleMs)) {
        val tombstone = new Path(dir, s"_commit.lock.stale-$owner")
        if (f.rename(lock, tombstone)) {
          f.delete(tombstone, false) // crashed driver's body, no longer needed
          lockStream = tryLock()
        }
      }
      if (lockStream == null)
        throw new IllegalStateException(
          s"$what: concurrent commit in flight at $dir " +
            s"(_commit.lock held${ageMs.map(a => s" for ${a / 1000}s").getOrElse("")}" +
            s"${if (lockBody.nonEmpty) s" by [$lockBody]" else ""}); retry after " +
            "it completes, or delete the lock if a crashed driver left it behind")
    }
    var ownsLock = true
    try {
      val myBody = s"${System.currentTimeMillis()} $owner"
      lockStream.write(myBody.getBytes("UTF-8"))
      lockStream.close()
      try ManifestSink.verifyLockOwnership(f, lock, myBody, dir.toString)
      catch { case e: IllegalStateException => ownsLock = false; throw e }
      body
    } finally if (ownsLock) f.delete(lock, false)
  }
}

private class ManifestTable(path: String, writeSchema: StructType)
  extends Table with SupportsWrite {
  override def name(): String = s"manifest_sink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = {
        val t = doTruncate
        val pBy = Option(info.options.get("partitionBy")).filter(_.nonEmpty)
        val fmt = ManifestFormat.of(Option(info.options.get("format")))
        new Write {
          override def toBatch: BatchWrite =
            new ManifestBatchWrite(path, info.schema(), t, pBy, fmt)
          // exactly-once STREAMING sink: each micro-batch commits as
          // one manifest version, idempotent by (queryId, epochId) —
          // the manifest records the last committed epoch per query,
          // so a post-failure replay of an already-committed batch
          // skips cleanly instead of duplicating rows. APPEND-only:
          // complete/truncate mode would have to rewrite the table
          // every batch — refuse loudly rather than silently append.
          override def toStreaming
            : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
            if (t) throw new UnsupportedOperationException(
              "ManifestSink streaming writes are append-only " +
                "(outputMode complete/update with truncate is not supported)")
            new ManifestStreamingWrite(path, info.schema(),
              info.queryId(), pBy, fmt)
          }
        }
      }
    }
}

/** Data-file format of a manifest table: `csv` (the original row-major
  * dialect) or `parquet` (columnar — the 100 TB default: ~3-10× fewer
  * bytes and column-pruned reads). The manifest/ACID/skipping layer is
  * format-agnostic: entries record the same (file, rows, checksum,
  * cols, stats) either way, the per-row identity hash is defined over
  * the CANONICAL CSV RENDERING of the row in both formats (so delete
  * vectors, the order-independent checksum, and compaction's
  * conservation guard work unchanged — even across a format-converting
  * rewrite), and readers dispatch on the file extension, so one table
  * may hold both formats mid-migration. */
private[graft] object ManifestFormat {
  val Csv = "csv"
  val Parquet = "parquet"

  def of(opt: Option[String]): String = opt.map(_.toLowerCase) match {
    case None | Some("") | Some(Csv) => Csv
    case Some(Parquet) => Parquet
    case Some(other) => throw new IllegalArgumentException(
      s"ManifestSink: unsupported format '$other' (csv or parquet)")
  }

  /** Detect the format of an existing table from its committed entries
    * (for rewrites that must preserve it): parquet iff every data file
    * is parquet; empty/mixed tables default to csv. */
  def detect(entries: Seq[ManifestEntry]): String =
    if (entries.nonEmpty && entries.forall(_.file.endsWith(".parquet")))
      Parquet
    else Csv
}

/** One committed data file (a task may produce several under
  * identity-partition fan-out). */
private[graft] case class ManifestFileCommit(file: String, rows: Long,
    checksum: Long, cols: String = "", stats: String = "",
    pv: Option[Long] = None, pt: Option[String] = None,
    // staged file's on-disk length (-1 = unknown), recorded into the
    // manifest so scan statistics never stat data files at plan time
    bytes: Long = -1L,
    // per-row-group metadata JSON ("" = none): multi-row-group parquet
    // files record each group's (rows, byte range, zone maps) so the
    // planner splits AND SKIPS inside one fat file
    rgs: String = "",
    // multi-transform partitioning: pipe-joined partition-value tuple
    // and transform list ("" = single or none; see ManifestFileWriter)
    pvs: String = "", pts: String = "")

private case class ManifestCommit(files: Seq[ManifestFileCommit])
  extends WriterCommitMessage

/** Streaming face of the sink: same commit protocol, plus the epoch
  * guard. Spark re-runs the last un-committed micro-batch after a
  * restart and may re-invoke commit for an epoch the sink already
  * published (the failure happened AFTER the manifest swap, BEFORE the
  * checkpoint commit) — the manifest's own `streamEpochs` record makes
  * that replay a no-op, which is the whole exactly-once contract for a
  * DSv2 streaming sink. */
private class ManifestStreamingWrite(path: String, schema: StructType,
    queryId: String, partitionBy: Option[String] = None,
    fmt: String = ManifestFormat.Csv)
  extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory
  private val core =
    new ManifestBatchWrite(path, schema, truncate = false, partitionBy, fmt)

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    core.writerFactory

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    core.commitCore(messages, s"_tmp-${core.writeId}-$epochId",
      Some((queryId, epochId)))

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    core.abortTmp(s"_tmp-${core.writeId}-$epochId")
}

private class ManifestBatchWrite(path: String, schema: StructType,
    truncate: Boolean, partitionBy: Option[String] = None,
    fmt: String = ManifestFormat.Csv)
  extends BatchWrite {

  // one temp namespace per write job: concurrent appends to the same
  // path never see (or clean up) each other's in-flight files
  private[sources] val writeId = java.util.UUID.randomUUID().toString

  // resolved ON THE DRIVER (this class is constructed there) so
  // session-level spark.hadoop.* settings — e.g. s3a credentials set
  // only on the SparkConf — reach executor-side writers too, via the
  // SerializableConfiguration shipped in the DataWriterFactory
  private val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration()))

  private def fs(): FileSystem =
    new Path(path).getFileSystem(hadoopConf.value)

  private[sources] def writerFactory: ManifestWriterFactory =
    new ManifestWriterFactory(path, writeId, schema, hadoopConf, partitionBy,
      fmt)

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = writerFactory

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    commitCore(messages, s"_tmp-$writeId", None)

  /** Shared commit path. `epoch` = Some((queryId, epochId)) for a
    * streaming micro-batch commit: the previous manifest's
    * `streamEpochs` entry decides idempotence (an epoch at or below
    * the last committed one is a checkpoint replay — its files are
    * discarded and nothing publishes). */
  private[sources] def commitCore(messages: Array[WriterCommitMessage],
      tmpDirName: String, epoch: Option[(String, Long)]): Unit = {
    val f = fs()
    val dir = new Path(path)
    // racing committers serialize on `_commit.lock` — exclusive create,
    // automatic stale-lock takeover and ownership re-verify all live in
    // ManifestLock (the one protocol shared with row-level DML and
    // maintenance publishes)
    ManifestLock.withLock(f, dir, writeId, "ManifestSink") {
      val manifestPath = new Path(dir, "manifest.json")
      // version numbering is monotonic ACROSS truncates (computed
      // before the truncate deletes the old version manifests): a
      // truncate expires old snapshots, it never recycles their ids
      val vRe = """manifest-v(\d+)\.json""".r
      val maxExistingV = f.listStatus(dir).map(_.getPath.getName).collect {
        case vRe(v) => v.toLong
      }.foldLeft(0L)(math.max)
      // Overwrite (SupportsTruncate): previous committed files vanish
      // with the old manifest. Append: the old manifest's entries are
      // carried into the new one, so the manifest ALWAYS describes the
      // full committed content — readers never need to list the dir.
      val previous: (Seq[ManifestEntry], Seq[(String, Long, Long)], Map[String, Long]) =
        if (truncate) {
          // truncate purges HISTORY too (the expire-snapshots analog):
          // version manifests reference the deleted part files, so they
          // must die with them — time travel spans appends since the
          // last truncate. Stream epoch records die too: a truncated
          // table is a new table.
          f.listStatus(dir).filter { st =>
            val n = st.getPath.getName
            n.startsWith("part-") || n.startsWith("dv-") ||
              n == "manifest.json" ||
              (n.startsWith("manifest-v") && n.endsWith(".json"))
          }.foreach(st => f.delete(st.getPath, false))
          (Nil, Nil, Map.empty)
        } else if (!f.exists(manifestPath)) (Nil, Nil, Map.empty)
        else {
          val in = f.open(manifestPath)
          val txt = try {
            val buf = new java.io.ByteArrayOutputStream()
            val chunk = new Array[Byte](8192)
            var n = in.read(chunk)
            while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
            buf.toString("UTF-8")
          } finally in.close()
          val dataEntries = ManifestRead.entriesOfText(txt)
          // delete vectors survive appends (merge-on-read: only a
          // compaction consumes them, only a truncate purges them)
          val dvEntries =
            """\{"dv":"([^"]+)","rows":(\d+),"checksum":(-?\d+)\}""".r
              .findAllMatchIn(txt)
              .map(m => (m.group(1), m.group(2).toLong, m.group(3).toLong))
              .toSeq
          (dataEntries, dvEntries, ManifestRead.streamEpochs(txt))
        }
      val (prevData, prevDvs, prevEpochs) = previous
      val commits =
        messages.toSeq.flatMap(_.asInstanceOf[ManifestCommit].files)
      val tmpDir = new Path(dir, tmpDirName)
      // EPOCH GUARD (streaming exactly-once): an epoch at or below the
      // last committed one for this query is a checkpoint replay — the
      // rows are already in the table; drop the replay's files and
      // publish nothing.
      val isReplay = epoch.exists { case (qid, e) =>
        prevEpochs.get(qid).exists(_ >= e)
      }
      if (isReplay) {
        f.delete(tmpDir, true)
        return
      }
      commits.foreach { c =>
        if (!f.rename(new Path(tmpDir, c.file), new Path(dir, c.file)))
          throw new java.io.IOException(
            s"ManifestSink: failed to move committed file ${c.file} into $path")
      }
      val all = prevData ++ commits.map(c => ManifestEntry(c.file, c.rows,
        c.checksum, Option(c.cols).filter(_.nonEmpty),
        Option(c.stats).filter(_.nonEmpty), c.pv, c.pt,
        Some(c.bytes).filter(_ >= 0), Option(c.rgs).filter(_.nonEmpty),
        Option(c.pvs).filter(_.nonEmpty), Option(c.pts).filter(_.nonEmpty)))
      val newEpochs = prevEpochs ++ epoch.map { case (qid, e) => qid -> e }
      val manifest = all.sortBy(_.file).map(ManifestRead.render)
        .mkString("[", ",", "]") + (
        if (prevDvs.isEmpty) ""
        else prevDvs.sortBy(_._1).map { case (fn, r, cs) =>
          s"""{"dv":"$fn","rows":$r,"checksum":$cs}"""
        }.mkString(""","deletes":[""", ",", "]")) +
        ManifestRead.renderEpochs(newEpochs)
      val total = all.map(_.rows).sum
      // write complete, then swap into place (delete-then-rename: no
      // reader ever sees a torn manifest)
      val manifestTmp = new Path(tmpDir, "manifest.json.new")
      val out = f.create(manifestTmp, true)
      try out.write(
        s"""{"total_rows":$total,"files":$manifest}""".getBytes("UTF-8"))
      finally out.close()
      f.delete(manifestPath, false)
      if (!f.rename(manifestTmp, manifestPath))
        throw new java.io.IOException(
          s"ManifestSink: failed to publish manifest at $manifestPath")
      // snapshot history: every commit also publishes an IMMUTABLE
      // numbered manifest (time travel — ManifestSource option
      // "version"). Numbering under the commit lock, so no races; the
      // write is temp + rename so a version file is never seen torn.
      val nextV = maxExistingV + 1
      val vTmp = new Path(dir, s"_manifest-v$nextV.tmp")
      val vOut = f.create(vTmp, true)
      try vOut.write(
        s"""{"total_rows":$total,"files":$manifest}""".getBytes("UTF-8"))
      finally vOut.close()
      if (!f.rename(vTmp, new Path(dir, s"manifest-v$nextV.json")))
        throw new java.io.IOException(
          s"ManifestSink: failed to publish manifest-v$nextV at $path")
      // losers' temp files (failed/speculative attempts) die with the dir
      f.delete(tmpDir, true)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    abortTmp(s"_tmp-$writeId")

  private[sources] def abortTmp(tmpDirName: String): Unit = {
    val f = fs()
    f.delete(new Path(new Path(path), tmpDirName), true)
  }
}

private[sources] class ManifestWriterFactory(path: String, writeId: String,
    schema: StructType,
    hadoopConf: org.apache.spark.util.SerializableConfiguration,
    partitionBy: Option[String] = None, fmt: String = ManifestFormat.Csv)
  extends DataWriterFactory
  with org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    createWriter(partitionId, taskId, s"_tmp-$writeId")

  // streaming face: each EPOCH stages into its own temp dir, so a
  // micro-batch commit moves (and cleans) exactly its own files
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    createWriter(partitionId, taskId, s"_tmp-$writeId-$epochId")

  private def createWriter(partitionId: Int, taskId: Long,
      tmpDirName: String): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // executors resolve the FS from the DRIVER's Hadoop conf (shipped
      // via SerializableConfiguration) so session-level spark.hadoop.*
      // settings — s3a credentials, endpoint overrides — apply here too
      private val fs = new Path(path).getFileSystem(hadoopConf.value)
      private val tmpDir = new Path(new Path(path), tmpDirName)
      fs.mkdirs(tmpDir)
      // identity-partition FAN-OUT (sink option "partitionBy", a BIGINT
      // column): each distinct partition value this task sees writes
      // its own file, whose manifest entry records the value — the
      // Iceberg fan-out writer. Rows with a NULL partition value fall
      // into an un-keyed file (no pv recorded), which conservatively
      // disables partition grouping for the whole table. Without the
      // option there is exactly one (un-keyed) file per task. Files
      // are created LAZILY on first row, so empty tasks commit nothing.
      private val pSpecs: Seq[ManifestPartSpec] =
        partitionBy.map(ManifestPartSpec.parseMulti).getOrElse(Nil)
      private val pIdxs: Seq[Int] = pSpecs.map { sp =>
        val i = schema.fieldIndex(sp.col)
        require(schema(i).dataType == LongType,
          s"ManifestSink partitionBy column ${sp.col} must be BIGINT, " +
            s"got ${schema(i).dataType.simpleString}")
        i
      }
      // OPEN writers are bounded (MaxOpen), independent of the distinct-
      // value guard below: each open writer holds a live output stream,
      // and with many concurrent tasks an unbounded map would exhaust
      // executor file descriptors before the 1000-value guard tripped.
      // Eviction is LRU (access re-inserts at the tail) and CLOSES the
      // victim's file — a later row for that value simply starts a NEW
      // uniquely-named file (multiple files per value per task are
      // already first-class manifest entries), so no append support is
      // needed from the filesystem.
      private val MaxOpen = 128
      private val parts = scala.collection.mutable.LinkedHashMap
        .empty[Option[Seq[Long]], ManifestFileWriter]
      private val finished =
        scala.collection.mutable.ArrayBuffer.empty[ManifestFileCommit]
      private val seenPvs =
        scala.collection.mutable.HashSet.empty[Option[Seq[Long]]]

      override def write(r: InternalRow): Unit = {
        // multi-transform key = the TUPLE of per-spec values (a NULL in
        // any component falls to the un-keyed file, like single-column)
        val pv: Option[Seq[Long]] =
          if (pIdxs.isEmpty || pIdxs.exists(r.isNullAt)) None
          else Some(pSpecs.zip(pIdxs).map { case (sp, i) =>
            sp.pv(r.getLong(i))
          })
        val w = parts.remove(pv).getOrElse {
          // fan-out guard: identity partitioning is for BOUNDED key
          // domains (buckets, days, shards). A high-cardinality column
          // would scatter one file per distinct value per task — fail
          // loudly before the manifest drowns in entries.
          seenPvs += pv
          require(seenPvs.size <= 1000,
            s"ManifestSink partitionBy=${partitionBy.get}: more than 1000 " +
              "distinct partition values in one task — identity " +
              "partitioning needs a bounded key domain (bucket the column " +
              "first, e.g. pmod(col, N))")
          if (parts.size >= MaxOpen) {
            val lru = parts.head._1
            finished += parts.remove(lru).get.finish()
          }
          new ManifestFileWriter(
            fs, tmpDir,
            f"part-$partitionId%05d-$taskId-${java.util.UUID.randomUUID()}.$fmt",
            schema, pv, if (pv.isDefined) pSpecs else Nil,
            hadoopConf.value)
        }
        parts.put(pv, w) // re-insert at the tail = LRU access order
        w.write(r)
      }

      override def commit(): WriterCommitMessage =
        ManifestCommit(finished.toSeq ++ parts.values.map(_.finish()).toSeq)

      override def abort(): Unit = {
        parts.values.foreach(_.abort())
        // evicted writers already closed their files — delete those too
        finished.foreach(c => fs.delete(new Path(tmpDir, c.file), false))
      }

      override def close(): Unit = parts.values.foreach(_.close())
    }
}

/** Per-file writer state: the CSV stream plus the statistics the
  * reader prunes on — null counts for every column, min/max for
  * NUMERIC columns, truncated UTF-8 byte bounds + a Bloom for STRING
  * columns. A NaN poisons a double column's bounds (dropped, so the
  * reader can never prune on a NaN-tainted range). Stats/cols are only
  * recorded when every column name is a simple identifier (no quoting
  * ambiguity in the manifest JSON). */
private class ManifestFileWriter(
    fs: FileSystem, tmpDir: Path, name: String, schema: StructType,
    pvs: Option[Seq[Long]], pSpecs: Seq[ManifestPartSpec],
    conf: Configuration = new Configuration()) {
  // single-transform files keep the legacy pv/pt manifest fields (every
  // pre-round-15 reader path); multi-transform files record the tuple
  // as pipe-joined pvs/pts
  private val pv: Option[Long] =
    pvs.filter(_ => pSpecs.length == 1).map(_.head)
  private val pt: Option[String] =
    if (pSpecs.length == 1 && pvs.isDefined) Some(pSpecs.head.render)
    else None
  private val pvsStr: String =
    if (pSpecs.length > 1) pvs.map(_.mkString("|")).getOrElse("") else ""
  private val ptsStr: String =
    if (pSpecs.length > 1 && pvs.isDefined)
      pSpecs.map(_.render).mkString("|")
    else ""
  // CSV and parquet writers share EVERYTHING above the byte encoding:
  // stats, Blooms, string bounds, and the per-row canonical-line hash
  // (the row identity delete vectors and the conservation guard use)
  // are computed from the same rendered values either way.
  private val isParquet = name.endsWith(".parquet")
  private val out: java.io.PrintWriter =
    if (isParquet) null
    else new java.io.PrintWriter(new java.io.OutputStreamWriter(
      fs.create(new Path(tmpDir, name), true), "UTF-8"))
  private val pq: ManifestParquet.RowParquetWriter =
    if (isParquet)
      new ManifestParquet.RowParquetWriter(new Path(tmpDir, name), schema, conf)
    else null
  private var rows = 0L
  private var checksum = 0L
  private val safeNames =
    schema.fieldNames.forall(_.matches("[A-Za-z0-9_]+"))
  private val nNulls = new Array[Long](schema.length)
  private val minL = Array.fill(schema.length)(Long.MaxValue)
  private val maxL = Array.fill(schema.length)(Long.MinValue)
  private val minD = Array.fill(schema.length)(Double.PositiveInfinity)
  private val maxD = Array.fill(schema.length)(Double.NegativeInfinity)
  private val sawNum = new Array[Boolean](schema.length)
  private val sawNaN = new Array[Boolean](schema.length)
  // per-file BLOOM over each string column's raw values: prunes
  // string EQUALITY at scan time, where min/max can't (collation)
  private val blooms: Array[Array[Long]] = schema.fields.map {
    case f if f.dataType == StringType =>
      new Array[Long](ManifestBloom.Bits / 64)
    case _ => null
  }
  private val sawStr = new Array[Boolean](schema.length)
  // Iceberg-style truncated BINARY string bounds (UTF-8 byte
  // prefixes, unsigned order = Spark's UTF8String order): sloB is
  // an inclusive lower bound (truncation only lowers a value);
  // shiB bounds the max — the value itself when it fits in T bytes
  // (inclusive), else the byte-successor of its prefix (exclusive,
  // shiX). A value whose prefix is all 0xFF has no successor: the
  // file's upper bound is dropped (shiDead). Lets the reader prune
  // string ranges and prefix probes where the Bloom (equality-only)
  // can't.
  private val sloB = new Array[Array[Byte]](schema.length)
  private val shiB = new Array[Array[Byte]](schema.length)
  private val shiX = new Array[Boolean](schema.length)
  private val shiDead = new Array[Boolean](schema.length)

  private def trackStrBounds(i: Int, v: String): Unit = {
    import ManifestStrBounds._
    val b = utf8(v)
    val t = trunc(b)
    if (sloB(i) == null || cmpB(t, sloB(i)) < 0) sloB(i) = t
    if (!shiDead(i)) {
      val (u, ex) =
        if (b.length <= T) (b, false)
        else succ(t) match {
          case Some(s) => (s, true)
          case None => shiDead(i) = true; (null, false)
        }
      if (!shiDead(i)) {
        if (shiB(i) == null) { shiB(i) = u; shiX(i) = ex }
        else {
          val c = cmpB(u, shiB(i))
          if (c > 0) { shiB(i) = u; shiX(i) = ex }
          // on a tie, inclusive wins: an attained value == bound
          // means the reader must NOT prune `>= bound`
          else if (c == 0 && !ex) shiX(i) = false
        }
      }
    }
  }

  // per-column dispatch precompiled to int tags so the per-row loop
  // does no DataType pattern matching and allocates no field array /
  // closure: 0=long, 1=int, 2=string, 3=timestamp(micros long),
  // 4=decimal, 5=boolean, 6=double, 7=other(render-only)
  private val colKind: Array[Int] = schema.fields.map(_.dataType match {
    case LongType => 0
    case IntegerType => 1
    case StringType => 2
    case TimestampType => 3
    case _: DecimalType => 4
    case BooleanType => 5
    case DoubleType => 6
    case _ => 7
  })
  private val colPrec: Array[Int] = schema.fields.map(_.dataType match {
    case d: DecimalType => d.precision; case _ => 0 })
  private val colScale: Array[Int] = schema.fields.map(_.dataType match {
    case d: DecimalType => d.scale; case _ => 0 })
  private val nFields = schema.length
  private val lineSb = new java.lang.StringBuilder(128)
  // reused per-row value carry between the fused pass and the parquet
  // render pass (strings/decimals are EXTRACTED once; numerics re-read
  // from the row — primitive getters, no allocation)
  private val strVals: Array[String] =
    if (isParquet) new Array[String](nFields) else null
  private val decVals: Array[Long] =
    if (isParquet) new Array[Long](nFields) else null
  private var curRow: InternalRow = _
  /** Emits EXACTLY GroupWriter's startField/addValue/endField sequence
    * for this row's non-null fields — identical parquet bytes, minus
    * the SimpleGroup materialization (see RowParquetWriter). */
  private val renderRow: org.apache.parquet.io.api.RecordConsumer => Unit =
    rc => {
      val r = curRow
      var i = 0
      while (i < nFields) {
        if (!r.isNullAt(i)) {
          val fn = schema.fields(i).name
          rc.startField(fn, i)
          colKind(i) match {
            case 0 | 3 => rc.addLong(r.getLong(i))
            case 1 => rc.addInteger(r.getInt(i))
            case 2 => rc.addBinary(
              org.apache.parquet.io.api.Binary.fromString(strVals(i)))
            case 4 => rc.addLong(decVals(i))
            case 5 => rc.addBoolean(r.getBoolean(i))
            case 6 => rc.addDouble(r.getDouble(i))
            case _ => throw new UnsupportedOperationException(
              s"ManifestSink parquet: unsupported type ${schema.fields(i).dataType}")
          }
          rc.endField(fn, i)
        }
        i += 1
      }
    }

  def write(r: InternalRow): Unit = {
    // ONE fused pass per row: render the canonical CSV line (the
    // checksum/stats/delete-vector identity — see class doc) into a
    // reused StringBuilder; for parquet the row then streams straight
    // into the record consumer (renderRow above) — no per-row Group.
    // Values, stats and renderings are identical to the former Group
    // shape by construction.
    val sb = lineSb
    sb.setLength(0)
    var i = 0
    while (i < nFields) {
      if (i > 0) sb.append(',')
      if (r.isNullAt(i)) nNulls(i) += 1 // canonical rendering: empty
      else colKind(i) match {
        case 0 | 3 =>
          // LONG, and session-UTC MICROSECONDS timestamps: the
          // InternalRow long itself is the canonical rendering
          // (integer-exact across formats) and the zone-map bound
          // (total order, no NaN/zone hazards); INT64 in parquet
          val v = r.getLong(i)
          if (v < minL(i)) minL(i) = v
          if (v > maxL(i)) maxL(i) = v
          sawNum(i) = true
          sb.append(v)
        case 1 =>
          val v = r.getInt(i)
          if (v < minL(i)) minL(i) = v.toLong
          if (v > maxL(i)) maxL(i) = v.toLong
          sawNum(i) = true
          sb.append(v)
        case 2 =>
          val v = r.getUTF8String(i).toString
          ManifestBloom.add(blooms(i), v)
          trackStrBounds(i, v)
          sawStr(i) = true
          sb.append(ManifestSink.csvField(v))
          if (strVals != null) strVals(i) = v
        case 4 =>
          // scale-stable plain rendering ("12.30" at scale 2 — never
          // scientific notation, identical from both formats' readers);
          // unscaled long, INT64(decimal) in parquet. Zone maps track
          // the UNSCALED long (order-preserving at the column's fixed
          // scale — getDecimal normalizes to it) at zero extra cost.
          val d = r.getDecimal(i, colPrec(i), colScale(i))
          val u = d.toUnscaledLong
          if (u < minL(i)) minL(i) = u
          if (u > maxL(i)) maxL(i) = u
          sawNum(i) = true
          sb.append(d.toJavaBigDecimal.toPlainString)
          if (decVals != null) decVals(i) = u
        case 5 =>
          sb.append(r.getBoolean(i)) // "true" / "false"
        case 6 =>
          val v = r.getDouble(i)
          if (v.isNaN) sawNaN(i) = true
          else {
            // Spark's nanSafeCompareDoubles treats -0.0 == 0.0; the
            // pruner compares with the same semantics, so bounds must
            // be recorded under it too — otherwise a file holding both
            // ±0.0 could record min=0.0 and a pushed `d < 0.0` probe
            // would prune a row the scan should emit. Normalizing the
            // *bound* (not the stored value) keeps primitive </> and
            // Double.compare in agreement for every non-NaN double.
            val b = if (v == 0.0d) 0.0d else v
            if (b < minD(i)) minD(i) = b
            if (b > maxD(i)) maxD(i) = b
            sawNum(i) = true
          }
          sb.append(v)
        case _ =>
          if (isParquet) throw new UnsupportedOperationException(
            s"ManifestSink parquet: unsupported type ${schema.fields(i).dataType}")
          sb.append(ManifestSink.csvField(
            r.get(i, schema.fields(i).dataType).toString))
      }
      i += 1
    }
    // order-independent file checksum: sum of per-row line hashes (the
    // CANONICAL rendering — identical for both formats, so checksums
    // and delete-vector hashes survive format-converting rewrites)
    val line = sb.toString
    checksum += line.hashCode.toLong
    rows += 1
    if (isParquet) { curRow = r; pq.write(renderRow) }
    else { out.print(line); out.print('\n') }
  }

  private def closeOut(): Unit = if (isParquet) pq.close() else out.close()

  def finish(): ManifestFileCommit = {
    closeOut()
    // length of the staged file, measured executor-side once per file
    // at write time (amortized), so the driver never has to stat data
    // files when Catalyst asks the scan for statistics
    val len =
      try fs.getFileStatus(new Path(tmpDir, name)).getLen
      catch { case _: java.io.IOException => -1L }
    // multi-row-group parquet: record each group's rows/byte-range/zone
    // maps so the scan planner can split and skip INSIDE the file (one
    // footer read here, executor-side, vs per-scan on the driver)
    val rgJson =
      if (!isParquet || !safeNames) ""
      else {
        val groups =
          try ManifestParquet.rowGroups(new Path(tmpDir, name), conf, schema)
          catch { case _: java.io.IOException => Nil }
        if (groups.isEmpty) "" else ManifestParquet.renderRgs(groups)
      }
    if (!safeNames)
      return ManifestFileCommit(name, rows, checksum, bytes = len)
    val stats = schema.fields.zipWithIndex.map { case (f, i) =>
      val bounds =
        if (sawNaN(i) || !sawNum(i)) ""
        else f.dataType match {
          case LongType | IntegerType | TimestampType =>
            s""","min":${minL(i)},"max":${maxL(i)}"""
          case DoubleType =>
            s""","min":${minD(i)},"max":${maxD(i)}"""
          case d: DecimalType =>
            // rescale the unscaled-long bounds to the column's plain
            // rendering (a valid JSON number, e.g. -1.50) — the pruner
            // compares them as BigDecimal values
            s""","min":${java.math.BigDecimal.valueOf(minL(i), d.scale)
              .toPlainString},"max":${java.math.BigDecimal
              .valueOf(maxL(i), d.scale).toPlainString}"""
          case _ => ""
        }
      val strBounds =
        if (sawStr(i) && sloB(i) != null) {
          val lo = s""","slo":"${ManifestStrBounds.b64(sloB(i))}""""
          val hi =
            if (shiB(i) != null && !shiDead(i))
              s""","shi":"${ManifestStrBounds.b64(shiB(i))}","shix":${shiX(i)}"""
            else ""
          lo + hi
        } else ""
      val bloom =
        if (blooms(i) != null && sawStr(i))
          s""","bloom":"${ManifestBloom.encode(blooms(i))}""""
        else ""
      s""""${f.name}":{"nulls":${nNulls(i)}$bounds$strBounds$bloom}"""
    }.mkString("{", ",", "}")
    ManifestFileCommit(name, rows, checksum,
      schema.fieldNames.mkString(","), stats, pv, pt, len, rgJson,
      pvsStr, ptsStr)
  }

  def abort(): Unit = {
    closeOut()
    fs.delete(new Path(tmpDir, name), false)
  }

  def close(): Unit = closeOut()
}
