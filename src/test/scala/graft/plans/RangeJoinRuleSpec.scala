package graft.plans

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RangeJoinRule: plan swap, result equality, and fail-closed scope. */
class RangeJoinRuleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def withWidth[A](w: Long)(f: => A): A = {
    graft.operators.OptimizerOps.ensureRangeRule(spark)
    spark.conf.set(RangeJoinRule.WidthConf, w.toString)
    try f finally spark.conf.set(RangeJoinRule.WidthConf, "0")
  }

  private def points = Tables.load(spark, dir, "events")
    .filter(col("ts").isNotNull)
    .select(unix_timestamp(col("ts")).as("sec"), col("event_id"))
  private def intervals = Tables.load(spark, dir, "events")
    .filter(col("ts").isNotNull && col("event_type") === "purchase")
    .limit(20)
    .select((unix_timestamp(col("ts")) - 1800).as("lo"),
      (unix_timestamp(col("ts")) + 1800).as("hi"))

  test("containment join swaps nested-loop for a hash join, same rows") {
    def joined = points.join(intervals, // def: queryExecution caches per
      col("sec") >= col("lo") && col("sec") <= col("hi")) // Dataset object
    val off = joined.queryExecution.executedPlan.toString
    assert(off.contains("NestedLoopJoin"),
      "without the rule this theta join must be a nested loop")
    val baseline = joined.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted
    withWidth(3600) {
      val fresh = joined
      val on = fresh.queryExecution.executedPlan.toString
      assert(!on.contains("NestedLoopJoin"),
        s"rule must remove the nested loop, got:\n$on")
      assert(on.contains("HashJoin") || on.contains("SortMergeJoin"))
      assert(on.contains("__graft_rj"), "bucket columns must drive the join")
      val got = fresh.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted
      assert(got === baseline)
    }
  }

  test("bucket math survives negative values crossing zero") {
    import spark.implicits._
    val pts = Seq(-7201L, -3601L, -1L, 0L, 1L, 3599L, 7200L)
      .toDF("sec")
    val ivs = Seq((-7200L, -1L), (-100L, 100L), (50L, 7200L))
      .toDF("lo", "hi")
    def joined = pts.join(ivs,
      col("sec") >= col("lo") && col("sec") <= col("hi"))
    val want = joined.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    withWidth(3600) {
      val fresh = joined
      assert(fresh.queryExecution.optimizedPlan.toString
        .contains("__graft_rj"), "rewrite must fire on the long columns")
      val got = fresh.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(got === want)
      assert(want.contains((-3601L, -7200L, -1L)),
        "fixture must exercise a negative-bucket match")
    }
  }

  test("fail-closed: equi-conjunct joins and outer joins are untouched") {
    import spark.implicits._
    val a = Seq((1L, 10L), (2L, 20L)).toDF("k", "t")
    val b = Seq((1L, 5L, 15L), (2L, 30L, 40L)).toDF("k2", "lo", "hi")
    withWidth(3600) {
      val equi = a.join(b, col("k") === col("k2") &&
        col("t") >= col("lo") && col("t") <= col("hi"))
      assert(!equi.queryExecution.optimizedPlan.toString
        .contains("__graft_rj"), "existing equi key → decline")
      val outer = a.join(b,
        col("t") >= col("lo") && col("t") <= col("hi"), "left")
      assert(!outer.queryExecution.optimizedPlan.toString
        .contains("__graft_rj"), "non-inner join → decline")
    }
  }

  test("empty and null intervals produce no matches and no errors") {
    import spark.implicits._
    val pts = Seq(0L, 100L).toDF("sec")
    val ivs = Seq[(java.lang.Long, java.lang.Long)](
      (200L, 100L), (null, 100L), (0L, null)).toDF("lo", "hi")
    withWidth(50) {
      val joined = pts.join(ivs,
        col("sec") >= col("lo") && col("sec") <= col("hi"))
      assert(joined.queryExecution.optimizedPlan.toString
        .contains("__graft_rj"))
      assert(joined.count() === 0L)
    }
  }

  test("q354 equals its rule-off nested-loop twin") {
    val want = graft.operators.OptimizerOps.burstFrame(spark, dir)
      .collect().map(_.toSeq).toSeq
    val got = SparkEntry.queries("q354_range_join_rule")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }
}
