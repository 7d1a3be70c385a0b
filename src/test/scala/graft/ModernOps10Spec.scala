package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q316 IVF lifecycle, q317 bootstrap CI, q318 histogram estimates. */
class ModernOps10Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q316 searches old and new vectors through one frozen index") {
    val rows = SparkEntry.queries("q316_ivf_incremental_index")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    // neighbors must span BOTH generations: some nid from the old half
    // and some from the appended batch — proof the probe sees one
    // unified index, not just the initial build
    val maxId = Tables.load(spark, dir, "embeddings")
      .agg(max("vec_id")).head().getLong(0)
    val nids = rows.map(_._2)
    assert(nids.exists(_ * 2 < maxId), "expected old-generation neighbors")
    assert(nids.exists(_ * 2 >= maxId),
      "expected appended-generation neighbors — the incremental index " +
        "update must be visible to search")
  }

  test("q317 replays the deterministic bootstrap for one user") {
    val rows = SparkEntry.queries("q317_bootstrap_ci")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, _, lo, hi) => assert(lo <= hi) }
    val (uid, nDays, total, lo, hi) = rows.head
    val xs = Tables.load(spark, dir, "events")
      .filter(col("user_id") === uid && col("value").isNotNull)
      .groupBy(to_date(col("ts")).as("d"))
      .agg((sum(col("value").cast("decimal(18,4)")) * 10000)
        .cast("long").as("x"))
      .orderBy("d").collect().map(_.getLong(1))
    assert(xs.length.toLong === nDays)
    assert(xs.sum === total)
    val n = xs.length
    val sums = (1 to 64).map { b =>
      (1 to n).map(i => xs(((b * 48271 + i * 16807) % n + 1) - 1)).sum
    }.sorted
    assert(lo === sums(3) && hi === sums(60),
      "CI bounds must be the 4th/61st order statistics of the replay")
  }

  test("q318 estimate is exact on clean FK data") {
    val rows = SparkEntry.queries("q318_histogram_join_estimate")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // sf corpora have unique customers and every order key present, so
    // n2 = d2 >= d1 and the uniform estimate collapses to n1 == actual
    // — the estimator must be EXACT here (error appears only under
    // dangling keys / skew, which the adversarial gate exercises)
    rows.foreach { case (b, n1, est, actual) =>
      assert(est === actual, s"bucket $b: est $est != actual $actual")
      assert(actual === n1)
    }
  }
}
