package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hidden range partitioning `truncate(w, col)` (q435's mechanism) and
  * the STRUCTURAL partition-value pruning shared by all transforms:
  *  - a range probe plans only the partitions whose [pv, pv+w) window
  *    overlaps it;
  *  - the pruning needs NO column stats — it still holds after the
  *    manifest's stats/cols fields are stripped (zone maps can't claim
  *    that);
  *  - bucket tables prune point lookups to the key's residue class;
  *  - catalog DDL `PARTITIONED BY (truncate(w, col))` persists and
  *    round-trips.
  */
class ManifestTruncateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_tr").toString
    new java.io.File(d).delete()
    d
  }

  private def planned(path: String)(
      df: org.apache.spark.sql.DataFrame): Long = {
    df.queryExecution.toRdd.getNumPartitions
    graft.sources.ManifestScanMetrics.plannedFiles(path)
  }

  private def rd(path: String) =
    spark.read.format("graft.sources.ManifestSource")
      .schema("sec LONG, v LONG").option("path", path).load()

  /** sec = 0..999 → ten truncate(100) partitions, one file each. */
  private def dayTable(path: String): Unit = {
    import spark.implicits._
    (0L until 1000L).map(i => (i, i * 3)).toDF("sec", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .option("path", path).option("partitionBy", "truncate(100,sec)")
      .mode("append").save()
  }

  test("range probe plans only overlapping truncate partitions") {
    val path = freshDir()
    dayTable(path)
    val entries = graft.sources.ManifestRead.entries(path, "manifest.json")
    assert(entries.length == 10 &&
      entries.forall(_.pt.contains("truncate(100,sec)")) &&
      entries.map(_.pv.get).sorted == (0L until 1000L by 100L),
      s"$entries")
    val probe = rd(path).filter(col("sec") >= 250L && col("sec") < 420L)
    assert(probe.collect().map(_.getLong(0)).sorted.toSeq ==
      (250L until 420L))
    assert(planned(path)(probe) == 3L, "250..419 spans pv 200, 300, 400")
    // equality probe: exactly one partition
    assert(planned(path)(rd(path).filter(col("sec") === 777L)) == 1L)
    // out-of-range: zero
    assert(planned(path)(rd(path).filter(col("sec") > 5000L)) == 0L)
  }

  test("pruning is STRUCTURAL: survives a stats-stripped manifest") {
    val path = freshDir()
    dayTable(path)
    // strip cols/stats from every entry (pre-round-12 manifest shape),
    // keeping pv/pt — zone maps now have nothing to prune on
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val entries = graft.sources.ManifestRead.entries(path, "manifest.json")
      .map(_.copy(cols = None, stats = None))
    val body = s"""{"total_rows":${entries.map(_.rows).sum},"files":${
      entries.sortBy(_.file).map(graft.sources.ManifestRead.render)
        .mkString("[", ",", "]")}}"""
    val mp = new org.apache.hadoop.fs.Path(fs.makeQualified(
      new org.apache.hadoop.fs.Path(path)), "manifest.json")
    fs.delete(mp, false)
    val out = fs.create(mp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val probe = rd(path).filter(col("sec") >= 250L && col("sec") < 420L)
    assert(probe.collect().map(_.getLong(0)).sorted.toSeq ==
      (250L until 420L))
    assert(planned(path)(probe) == 3L,
      "partition-value pruning must not depend on column stats")
  }

  test("bucket tables prune point lookups to the residue class") {
    import spark.implicits._
    val path = freshDir()
    (0L until 100L).map(i => (i, i)).toDF("sec", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .option("path", path).option("partitionBy", "bucket(4,sec)")
      .mode("append").save()
    assert(graft.sources.ManifestRead.entries(path, "manifest.json")
      .length == 4)
    // sec = 10 -> bucket floorMod(10,4) = 2: ONE file planned (min/max
    // zone maps are useless here — every bucket spans 0..99)
    val probe = rd(path).filter(col("sec") === 10L)
    assert(probe.collect().map(_.getLong(0)).toSeq == Seq(10L))
    assert(planned(path)(probe) == 1L,
      "a point lookup must plan only its bucket's files")
  }

  test("catalog DDL: PARTITIONED BY (truncate(w, col)) persists") {
    val base = java.nio.file.Files.createTempDirectory("graft_trc").toString
    val cat = "trc_" + math.abs(base.hashCode)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.ManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    val t = s"$cat.db.t"
    spark.sql(s"CREATE TABLE $t (sec BIGINT, v BIGINT) " +
      "PARTITIONED BY (truncate(100, sec))")
    spark.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, id * 2 " +
      "FROM range(0, 500)")
    val entries =
      graft.sources.ManifestRead.entries(s"$base/db/t", "manifest.json")
    assert(entries.length == 5 &&
      entries.forall(_.pt.contains("truncate(100,sec)")), s"$entries")
    val r = spark.sql(
      s"SELECT count(*), sum(v) FROM $t WHERE sec >= 150 AND sec < 300")
      .first()
    assert((r.getLong(0), r.getLong(1)) == (150L, 2 * (150L until 300L).sum))
    assert(graft.sources.ManifestScanMetrics.plannedFiles(s"$base/db/t")
      == 2L, "150..299 spans pv 100 and 200")
  }
}
