package graft.sources

import org.apache.hadoop.fs.Path

/** Maintenance for a [[ManifestSink]] directory: snapshot expiry.
  *
  * Every commit publishes an immutable `manifest-v{n}.json`; across
  * many appends the version history grows without bound (the round-10
  * scale note). `expireSnapshots(path, keepLast)` deletes all version
  * manifests older than the newest `keepLast`, under the sink's own
  * `_commit.lock` so an expiry never races a commit's version-number
  * scan. Only the HISTORY dies: appends carry every previous file
  * forward into the newer manifests, so no data file is referenced
  * exclusively by an expired version — expiry can never orphan or
  * strand committed data (a truncate is the only operation that
  * deletes part files, and it already purges history itself).
  * Reading an expired version afterwards fails loudly with the same
  * FileNotFoundException a truncate-expired version raises.
  */
object ManifestMaintenance {

  /** Delete all but the newest `keepLast` version manifests at `path`.
    * Returns the number of snapshots expired. Takes `_commit.lock`
    * exclusively (same protocol as the sink: fail loudly on a live
    * lock rather than race a commit). */
  def expireSnapshots(
      spark: org.apache.spark.sql.SparkSession,
      path: String, keepLast: Int): Int = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) return 0
    val lock = new Path(dir, "_commit.lock")
    val lockStream =
      try fs.create(lock, false)
      catch {
        case _: java.io.IOException =>
          throw new IllegalStateException(
            s"ManifestMaintenance: a commit is in flight at $path " +
              "(_commit.lock held); retry expiry after it completes")
      }
    try {
      lockStream.write(
        s"${System.currentTimeMillis()} expire-snapshots".getBytes("UTF-8"))
      lockStream.close()
      val vRe = """manifest-v(\d+)\.json""".r
      val versions = fs.listStatus(dir).map(_.getPath.getName).collect {
        case vRe(v) => v.toLong
      }.sorted
      val expire = versions.dropRight(keepLast)
      expire.foreach(v => fs.delete(new Path(dir, s"manifest-v$v.json"), false))
      expire.length
    } finally fs.delete(lock, false)
  }
}
