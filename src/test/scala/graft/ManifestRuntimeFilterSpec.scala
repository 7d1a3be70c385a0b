package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime file pruning via `SupportsRuntimeV2Filtering` (q437's
  * mechanism — the DSv2 dynamic-partition-pruning hook): at execution,
  * Spark hands the fact scan the dim side's join keys as an IN
  * predicate; files whose partition values / zone maps / Blooms prove
  * none of those keys occur are never opened. Pins:
  *  - a dim-filtered join plans only the fact files holding surviving
  *    keys (partition-value prune on a truncate-partitioned fact);
  *  - zone-map-only tables (no partitioning) prune too;
  *  - results are identical with pruning in play (file-level only —
  *    extra rows in kept files are the join's job to drop).
  */
class ManifestRuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_rf").toString
    new java.io.File(d).delete()
    d
  }

  private def withConfs[T](confs: (String, String)*)(body: => T): T = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("dim-filtered join prunes fact files at runtime (partition values)") {
    import spark.implicits._
    val fact = freshDir(); val dim = freshDir()
    // 8 truncate(1000) partitions, one file each, k = 0..7999
    (0L until 8000L).map(i => (i, i * 2)).toDF("k", "cents").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .option("path", fact).option("partitionBy", "truncate(1000,k)")
      .mode("append").save()
    assert(graft.sources.ManifestRead.entries(fact, "manifest.json")
      .length == 8)
    // dim keys live ONLY in fact partition 0
    (0L until 1000L by 7L).map(i => (i, 1L)).toDF("k", "sel").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .option("path", dim).mode("append").save()
    def rd(p: String, ddl: String) =
      spark.read.format("graft.sources.ManifestSource")
        .schema(ddl).option("path", p).load()
    withConfs(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false") {
      // the dim predicate must SURVIVE as a plan-side Filter for the
      // DPP planner to see a selective filtering side — a modulo isn't
      // pushable, the common real-dim shape (IN-lists, expressions)
      val j = rd(fact, "k LONG, cents LONG")
        .join(rd(dim, "k LONG, sel LONG").filter(col("sel") % 2 === 1L), "k")
      val got = j.agg(count(lit(1)), sum("cents")).first()
      val keys = (0L until 1000L by 7L)
      assert((got.getLong(0), got.getLong(1)) ==
        (keys.size.toLong, keys.map(_ * 2).sum))
      assert(graft.sources.ManifestScanMetrics.candidateFiles(fact) == 8L)
      assert(graft.sources.ManifestScanMetrics.plannedFiles(fact) == 1L,
        "runtime IN over the partition values must plan ONLY partition 0")
    }
  }

  test("runtime pruning with v2 bucketing ON (layout materialized early)") {
    // with bucketing enabled, outputPartitioning materializes the keyed
    // layout BEFORE the runtime filter arrives — the planned splits
    // must still honor the filter (they group the filtered entry set,
    // not the cached layout)
    import spark.implicits._
    val fact = freshDir(); val dim = freshDir()
    (0L until 8000L).map(i => (i, i * 2)).toDF("k", "cents").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .option("path", fact).option("partitionBy", "truncate(1000,k)")
      .mode("append").save()
    (0L until 1000L by 7L).map(i => (i, 1L)).toDF("k", "sel").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .option("path", dim).mode("append").save()
    def rd(p: String, ddl: String) =
      spark.read.format("graft.sources.ManifestSource")
        .schema(ddl).option("path", p).load()
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false") {
      val j = rd(fact, "k LONG, cents LONG")
        .join(rd(dim, "k LONG, sel LONG").filter(col("sel") % 2 === 1L), "k")
      val got = j.agg(count(lit(1)), sum("cents")).first()
      val keys = (0L until 1000L by 7L)
      assert((got.getLong(0), got.getLong(1)) ==
        (keys.size.toLong, keys.map(_ * 2).sum))
      assert(graft.sources.ManifestScanMetrics.plannedFiles(fact) == 1L)
    }
  }

  test("zone maps prune unpartitioned facts at runtime too") {
    import spark.implicits._
    val fact = freshDir(); val dim = freshDir()
    // 4 files with disjoint k ranges, NO partitioning — only zone maps
    (0 until 4).foreach { i =>
      ((i * 100L) until ((i + 1) * 100L)).map(j => (j, j + 5))
        .toDF("k", "v").coalesce(1)
        .write.format("graft.sources.ManifestSink")
        .option("path", fact).mode("append").save()
    }
    Seq((7L, 1L), (42L, 1L)).toDF("k", "sel").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .option("path", dim).mode("append").save()
    def rd(p: String, ddl: String) =
      spark.read.format("graft.sources.ManifestSource")
        .schema(ddl).option("path", p).load()
    withConfs(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false") {
      val j = rd(fact, "k LONG, v LONG")
        .join(rd(dim, "k LONG, sel LONG").filter(col("sel") % 2 === 1L), "k")
      assert(j.collect().map(_.getLong(0)).sorted.toSeq == Seq(7L, 42L))
      assert(graft.sources.ManifestScanMetrics.plannedFiles(fact) == 1L,
        "both dim keys live in file 1's [0,99] range — one file planned")
    }
  }
}
