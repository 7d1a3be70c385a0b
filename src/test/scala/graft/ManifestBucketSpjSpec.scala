package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucket-transform storage-partitioned joins (q434's mechanism):
  * `PARTITIONED BY (bucket(n, col))` on catalog tables — the high-
  * cardinality answer identity partitioning can't give (one file per
  * DISTINCT VALUE dies at scale; one file per BUCKET is bounded by n).
  *  - the writer fans out at most n files per task, manifest entries
  *    carry `pt=bucket(n,col)` + the bucket id;
  *  - the scan reports `KeyGroupedPartitioning(bucket(n, col))`, the
  *    catalog serves the bucket function, and two same-bucketing
  *    tables join with ZERO exchanges under the join;
  *  - identity partitioning on the same key count would trip the
  *    1000-value fan-out guard — bucket(8) sails through.
  */
class ManifestBucketSpjSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshCatalog(): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft_bkt").toString
    val name = "bkt_" + math.abs(base.hashCode)
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

  test("bucket(8,k): high-cardinality keys, bounded fan-out, SPJ join") {
    val (cat, base) = freshCatalog()
    val a = s"$cat.db.a"; val b = s"$cat.db.b"
    spark.sql(s"CREATE TABLE $a (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql(s"CREATE TABLE $b (k BIGINT, w BIGINT) " +
      "PARTITIONED BY (bucket(8, k))")
    // 5000 DISTINCT keys through one task — identity partitioning would
    // trip the 1000-value guard; bucket(8) writes at most 8 files
    import spark.implicits._
    (0L until 5000L).map(i => (i, i * 2)).toDF("k", "v")
      .coalesce(1).createOrReplaceTempView("graft_bkt_a")
    (0L until 5000L by 2).map(i => (i, i * 3)).toDF("k", "w")
      .coalesce(1).createOrReplaceTempView("graft_bkt_b")
    spark.sql(s"INSERT INTO $a SELECT k, v FROM graft_bkt_a")
    spark.sql(s"INSERT INTO $b SELECT k, w FROM graft_bkt_b")
    val entriesA =
      graft.sources.ManifestRead.entries(s"$base/db/a", "manifest.json")
    assert(entriesA.nonEmpty && entriesA.forall(e =>
      e.pt.contains("bucket(8,k)") && e.pv.exists(p => p >= 0 && p < 8)),
      s"entries must carry bucket ids: $entriesA")

    withSpj {
      val j = spark.sql(
        s"SELECT a.k, a.v, b.w FROM $a a JOIN $b b ON a.k = b.k")
      assert(j.count() == 2500)
      val plan = j.queryExecution.executedPlan
      val join = plan.collectFirst { case s: SortMergeJoinExec => s }
      assert(join.isDefined, s"expected a sort-merge join:\n$plan")
      val shufflesUnderJoin = join.get.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shufflesUnderJoin.isEmpty,
        s"bucketed SPJ must plan ZERO exchanges under the join:\n$plan")
      // spot-check values
      val r = j.filter(col("k") === 4200L).first()
      assert((r.getLong(1), r.getLong(2)) == (8400L, 12600L))
    }
  }

  test("bucket ids agree across writers: same key lands co-located") {
    val (cat, base) = freshCatalog()
    val t = s"$cat.db.c"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    // negative keys: floorMod keeps ids in [0, n)
    spark.sql(s"INSERT INTO $t VALUES (-7, 1), (-3, 2), (5, 3), (1, 4)")
    val entries =
      graft.sources.ManifestRead.entries(s"$base/db/c", "manifest.json")
    assert(entries.forall(_.pv.exists(p => p >= 0 && p < 4)))
    // -7 and 1: floorMod(-7,4)=1, floorMod(1,4)=1 — same bucket file set
    val got = spark.sql(s"SELECT k FROM $t ORDER BY k").collect()
      .map(_.getLong(0)).toSeq
    assert(got == Seq(-7L, -3L, 1L, 5L))
  }
}
