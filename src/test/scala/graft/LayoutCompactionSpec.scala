package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Layout-aware compaction (ManifestMaintenance.compact with
  * `clusterBy`): re-clustering must IMPROVE zone-map pruning — a box
  * probe plans fewer files after a Z-order rewrite, a range probe
  * plans fewer files after a sort rewrite — while the conservation
  * guard stays green (identical rows and aggregate before/after).
  */
class LayoutCompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_lcmp").toString
    new java.io.File(d).delete()
    d
  }

  /** 4096-point 64x64 grid, written round-robin into 8 files so EVERY
    * file spans the whole (d1, d2) domain — the worst layout for
    * pruning. */
  private def scatteredTable(path: String): Unit = {
    val df = spark.range(4096).select(
      (col("id") % 64 * 4).as("d1"),
      (col("id") / 64 * 4).cast("long").as("d2"),
      col("id").as("w"))
    (0 to 7).foreach { b =>
      df.filter(col("w") % 8 === b).coalesce(1)
        .write.format("graft.sources.ManifestSink")
        .option("path", path).mode("append").save()
    }
  }

  private def scan(path: String) =
    spark.read.format("graft.sources.ManifestSource")
      .schema("d1 LONG, d2 LONG, w LONG").option("path", path).load()

  private def planned(path: String)(
      df: org.apache.spark.sql.DataFrame): Long = {
    df.queryExecution.toRdd.getNumPartitions
    graft.sources.ManifestScanMetrics.plannedFiles(path)
  }

  private val zexpr = (0 until 8).map { i =>
    s"((d1 div ${1 << i}) % 2) * ${1L << (2 * i)} + " +
      s"((d2 div ${1 << i}) % 2) * ${1L << (2 * i + 1)}"
  }.mkString(" + ")

  test("z-order compaction: box probe plans fewer files, rows conserved") {
    val path = freshDir()
    scatteredTable(path)
    def box = scan(path).filter(
      col("d1") >= 64 && col("d1") <= 127 &&
        col("d2") >= 64 && col("d2") <= 127)
    val beforeRows = box.agg(count(lit(1)), sum("w")).first()
    assert(planned(path)(box) == 8L, "fixture lost its point: box must hit all files")
    val (nb, na) = graft.sources.ManifestMaintenance.compact(
      spark, path, "d1 LONG, d2 LONG, w LONG",
      targetFiles = 8, clusterBy = Seq(zexpr))
    assert(nb == 8 && na == 8, s"($nb, $na)")
    val afterRows = box.agg(count(lit(1)), sum("w")).first()
    assert(afterRows == beforeRows)
    val p = planned(path)(box)
    assert(p <= 4L && p >= 1L,
      s"z-order compaction did not improve box pruning: planned $p of 8")
    // full-table integrity after the rewrite
    assert(scan(path).count() == 4096L)
  }

  test("sort compaction: range probe plans fewer files; time travel intact") {
    val path = freshDir()
    scatteredTable(path)
    def range = scan(path).filter(col("d1") >= 200 && col("d1") <= 220)
    assert(planned(path)(range) == 8L)
    val vBefore = graft.sources.ManifestRead.latestVersion(path)
    graft.sources.ManifestMaintenance.compact(
      spark, path, "d1 LONG, d2 LONG, w LONG",
      targetFiles = 8, clusterBy = Seq("d1"))
    val p = planned(path)(range)
    assert(p <= 2L && p >= 1L,
      s"sort compaction did not improve range pruning: planned $p of 8")
    // the pre-compaction snapshot still reads byte-identically
    val old = spark.read.format("graft.sources.ManifestSource")
      .schema("d1 LONG, d2 LONG, w LONG")
      .option("path", path).option("version", vBefore).load()
    assert(old.count() == 4096L)
    // deterministic layout: a second identical rewrite yields the same
    // per-file stats (exact ntile over a total order, no sampling)
    val stats1 = graft.sources.ManifestRead.entries(path, "manifest.json")
      .map(e => (e.rows, e.stats)).sortBy(_.toString)
    graft.sources.ManifestMaintenance.compact(
      spark, path, "d1 LONG, d2 LONG, w LONG",
      targetFiles = 8, clusterBy = Seq("d1"))
    val stats2 = graft.sources.ManifestRead.entries(path, "manifest.json")
      .map(e => (e.rows, e.stats)).sortBy(_.toString)
    assert(stats1 == stats2, "layout rewrite is not deterministic")
  }
}
