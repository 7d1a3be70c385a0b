package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** COMPOSITE-key storage-partitioned joins (q441's mechanism):
  * `PARTITIONED BY (bucket(8, k), region)` — real star schemas
  * co-partition on more than one column. The fan-out writer keys files
  * by the value TUPLE (manifest `pvs`/`pts` fields), the scan reports
  * a multi-expression `KeyGroupedPartitioning`, and two tables with
  * the same composite layout join on (k, region) with ZERO exchanges.
  */
class ManifestMultiKeySpjSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshCatalog(): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft_mk").toString
    val name = "mk_" + math.abs(base.hashCode)
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.ManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.base", base)
    (name, base)
  }

  private def withSpj[T](body: => T): T = {
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("(bucket(8,k), region): composite tuple files + zero-exchange join") {
    val (cat, base) = freshCatalog()
    val a = s"$cat.db.a"; val b = s"$cat.db.b"
    spark.sql(s"CREATE TABLE $a (k BIGINT, region BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(8, k), region)")
    spark.sql(s"CREATE TABLE $b (k BIGINT, region BIGINT, w BIGINT) " +
      "PARTITIONED BY (bucket(8, k), region)")
    import spark.implicits._
    (0L until 2000L).map(i => (i, i % 3, i * 2)).toDF("k", "region", "v")
      .coalesce(1).createOrReplaceTempView("graft_mk_a")
    (0L until 2000L by 2).map(i => (i, i % 3, i * 3)).toDF("k", "region", "w")
      .coalesce(1).createOrReplaceTempView("graft_mk_b")
    spark.sql(s"INSERT INTO $a SELECT * FROM graft_mk_a")
    spark.sql(s"INSERT INTO $b SELECT * FROM graft_mk_b")
    // entries carry the pipe-joined tuple, not the legacy single pv
    val entries =
      graft.sources.ManifestRead.entries(s"$base/db/a", "manifest.json")
    assert(entries.nonEmpty && entries.forall(e =>
      e.pts.contains("bucket(8,k)|region") && e.pv.isEmpty &&
        e.pvs.exists(_.split('|').length == 2)),
      s"composite entries must carry pvs/pts: $entries")

    withSpj {
      val j = spark.sql(s"SELECT a.k, a.region, a.v, b.w FROM $a a " +
        s"JOIN $b b ON a.k = b.k AND a.region = b.region")
      assert(j.count() == 1000)
      val plan = j.queryExecution.executedPlan
      val join = plan.collectFirst { case s: SortMergeJoinExec => s }
      assert(join.isDefined, s"expected a sort-merge join:\n$plan")
      assert(join.get.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"composite-key SPJ must plan ZERO exchanges under the join:\n$plan")
      val r = j.filter(col("k") === 1200L).first()
      assert((r.getLong(2), r.getLong(3)) == (2400L, 3600L))
    }
  }

  test("composite partition values prune structurally") {
    val (cat, base) = freshCatalog()
    val t = s"$cat.db.p"
    spark.sql(s"CREATE TABLE $t (k BIGINT, region BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k), region)")
    import spark.implicits._
    // region decorrelated from bucket(4,k): all 4×2 tuples materialize
    (0L until 400L).map(i => (i, (i / 100) % 2, i)).toDF("k", "region", "v")
      .coalesce(1).createOrReplaceTempView("graft_mk_p")
    spark.sql(s"INSERT INTO $t SELECT * FROM graft_mk_p")
    val dir = s"$base/db/p"
    assert(graft.sources.ManifestRead.entries(dir, "manifest.json")
      .length == 8) // 4 buckets × 2 regions
    // equality on BOTH composite columns prunes to the one tuple file
    val probe = spark.sql(
      s"SELECT sum(v) FROM $t WHERE k = 42 AND region = 0")
    assert(probe.collect().head.getLong(0) == 42L)
    val (planned, cand) = {
      val df = spark.sql(
        s"SELECT v FROM $t WHERE k = 42 AND region = 0")
      df.queryExecution.toRdd.getNumPartitions
      graft.sources.ManifestScanMetrics.filesOf(df, dir)
    }
    assert(cand == 8 && planned == 1,
      s"composite pruning must plan 1 of 8 tuple files, got $planned/$cand")
  }
}
