package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Identity-partitioned manifest tables (sink option "partitionBy") +
  * storage-partitioned join on the real connector (q428's mechanism):
  *  - the fan-out writer produces one file per (task, value) with the
  *    value recorded in the manifest entry;
  *  - the scan plans one partition per value and reports
  *    KeyGroupedPartitioning, so the join plans ZERO hash exchanges;
  *  - a NULL partition value conservatively disables grouping;
  *  - partition-value probes plan only that value's files.
  */
class ManifestSpjSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_spj").toString
    new java.io.File(d).delete()
    d
  }

  private def writeKeyed(path: String, rows: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("b", "v").repartition(4, col("b"))
      .write.format("graft.sources.ManifestSink")
      .option("path", path).option("partitionBy", "b")
      .mode("append").save()
  }

  private def rd(path: String, ddl: String = "b LONG, v LONG") =
    spark.read.format("graft.sources.ManifestSource")
      .schema(ddl).option("path", path).load()

  test("fan-out writer: one file per value, pv/pt recorded") {
    val path = freshDir()
    writeKeyed(path, (0L until 40L).map(i => (i % 4, i)))
    val entries = graft.sources.ManifestRead.entries(path, "manifest.json")
    assert(entries.length == 4, s"expected 4 files, got ${entries.map(_.file)}")
    assert(entries.flatMap(_.pv).sorted == Seq(0L, 1L, 2L, 3L))
    assert(entries.forall(_.pt.contains("b")))
    // scan plans one partition per value
    assert(rd(path).rdd.getNumPartitions == 4)
    // content intact
    assert(rd(path).agg(sum("v")).first().getLong(0) == (0L until 40L).sum)
  }

  test("SPJ: join of two keyed manifest tables plans zero hash exchanges") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    val p1 = freshDir(); val p2 = freshDir()
    writeKeyed(p1, (0L until 40L).map(i => (i % 4, i)))
    writeKeyed(p2, (0L until 20L).map(i => (i % 4, i * 10)))
    graft.operators.LakehouseOps.withSpjConfs(spark) {
      val df = rd(p1).toDF("b", "v1")
        .join(rd(p2).toDF("b", "v2"), Seq("b"))
        .groupBy("b").agg(count(lit(1)).as("n"))
      val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(0L -> 50L, 1L -> 50L, 2L -> 50L, 3L -> 50L), s"$got")
      def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => a +: nodes(a.executedPlan)
        case q: QueryStageExec => q +: nodes(q.plan)
        case o => o +: (o.children ++ o.subqueries).flatMap(nodes)
      }
      val all = nodes(df.queryExecution.executedPlan)
      assert(all.exists(n =>
        n.isInstanceOf[SortMergeJoinExec] || n.isInstanceOf[ShuffledHashJoinExec]),
        "expected a shuffle-class join operator")
      val exchanges = all.filter(_.isInstanceOf[ShuffleExchangeLike])
      assert(exchanges.isEmpty,
        s"manifest SPJ must plan ZERO exchanges, found:\n" +
          df.queryExecution.executedPlan)
    }
  }

  test("NULL partition value disables grouping, rows intact") {
    import spark.implicits._
    val path = freshDir()
    Seq((Some(1L), 10L), (None, 20L), (Some(2L), 30L))
      .toDF("b", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .option("path", path).option("partitionBy", "b")
      .mode("append").save()
    val entries = graft.sources.ManifestRead.entries(path, "manifest.json")
    assert(entries.count(_.pv.isDefined) == 2)
    assert(entries.count(_.pv.isEmpty) == 1)
    // grouping off (one un-keyed file) — but every row still reads
    assert(rd(path).agg(sum("v")).first().getLong(0) == 60L)
    val scan = rd(path)
    scan.queryExecution.toRdd.getNumPartitions
    // no KeyGroupedPartitioning claim: join would shuffle, which is
    // correct — never claim a clustering the files don't have
  }

  test("partition-value probe plans only that value's files") {
    val path = freshDir()
    writeKeyed(path, (0L until 40L).map(i => (i % 4, i)))
    val probe = rd(path).filter(col("b") === 2L)
    assert(probe.collect().map(_.getLong(1)).sorted.toSeq ==
      (0L until 40L).filter(_ % 4 == 2).sorted)
    probe.queryExecution.toRdd.getNumPartitions
    val planned = graft.sources.ManifestScanMetrics.plannedFiles(path)
    assert(planned == 1L, s"b=2 probe planned $planned files of 4")
  }

  test("fan-out past the open-handle bound: rows conserved, pv intact") {
    // 300 distinct values through one task exceeds the writer's MaxOpen
    // (128): LRU eviction must close+finish files and reopen NEW files
    // for revisited values without losing or duplicating a row
    import spark.implicits._
    val path = freshDir()
    val rows = (0L until 600L).map(i => (i % 300, i))
    rows.toDF("b", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .option("path", path).option("partitionBy", "b")
      .mode("append").save()
    val got = rd(path).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq == rows.sorted)
    val entries = graft.sources.ManifestRead.entries(path, "manifest.json")
    assert(entries.forall(e => e.pv.isDefined && e.pt.contains("b")),
      "every evicted/reopened file must still carry its partition value")
    // interleaved revisits force >300 files (reopens), never >1 stream
    // per value concurrently — the bound is on OPEN handles, not files
    assert(entries.length >= 300)
  }

  test("partitionBy on a non-BIGINT column fails loudly") {
    import spark.implicits._
    val path = freshDir()
    val e = intercept[Exception] {
      Seq(("x", 1L)).toDF("b", "v").coalesce(1)
        .write.format("graft.sources.ManifestSink")
        .option("path", path).option("partitionBy", "b")
        .mode("append").save()
    }
    assert(e.getMessage != null)
  }
}
