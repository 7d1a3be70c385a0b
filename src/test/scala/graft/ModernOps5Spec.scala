package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** q304 MV rollup rewrite: the value of the operator is the PLAN swap,
  * so the spec pins (a) the rewritten query scans the MV files and not
  * the fact table, (b) values equal the base-table aggregation, and
  * (c) the rule fails closed — a non-covered measure still scans the
  * fact table, and the rule is inert with the conf off.
  */
class ModernOps5Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    df.collect() // finalize (AQE) before inspecting
    def scans(p: SparkPlan): Seq[String] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString).toSeq
      case other =>
        (other.children ++ other.subqueries).flatMap(scans)
    }
    scans(df.queryExecution.executedPlan)
  }

  test("q304 rewrites the fact rollup onto the MV and matches the base table") {
    val mvPath = operators.OptimizerOps.buildAndRegisterMv(spark, dir)
    operators.OptimizerOps.ensureMvRule(spark)
    spark.conf.set("spark.graft.mvRewrite", "true")
    try {
      val df = operators.OptimizerOps.mvRollupFrame(spark, dir)
      val paths = scanPaths(df)
      assert(paths.exists(_.contains(mvPath.split('/').last)),
        s"rollup must scan the MV, scanned: $paths")
      assert(!paths.exists(_.endsWith("lineitem.parquet")),
        s"fact table must not be scanned, scanned: $paths")
      val got = df.collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2)))
      // base-table truth, rule disabled
      spark.conf.set("spark.graft.mvRewrite", "false")
      val base = operators.OptimizerOps.mvRollupFrame(spark, dir)
      assert(scanPaths(base).exists(_.endsWith("lineitem.parquet")),
        "control query must scan the fact table with the rule off")
      val want = base.collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2)))
      assert(got.toSeq === want.toSeq)
    } finally spark.conf.set("spark.graft.mvRewrite", "false")
  }

  test("q305 joins the co-partitioned DSv2 tables with zero exchanges") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    operators.LakehouseOps.withSpjConfs(spark) {
      val df = operators.LakehouseOps.spjFrame(spark)
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => a +: nodes(a.executedPlan)
        case q: QueryStageExec => q +: nodes(q.plan)
        case o => o +: (o.children ++ o.subqueries).flatMap(nodes)
      }
      val all = nodes(df.queryExecution.executedPlan)
      assert(all.exists(n =>
        n.isInstanceOf[SortMergeJoinExec] || n.isInstanceOf[ShuffledHashJoinExec]),
        "expected a shuffle-class join operator")
      // the ONLY exchange allowed is the final ORDER BY's range
      // partitioning; the join and the aggregation must reuse the
      // storage partitioning (zero hash exchanges)
      val exchanges = all.filter(_.isInstanceOf[ShuffleExchangeLike])
      assert(exchanges.forall(_.toString.contains("rangepartitioning")),
        s"storage-partitioned join must plan ZERO hash exchanges, found:" +
          s"\n${df.queryExecution.executedPlan}")
      // spot-check one group against the closed form: per key,
      // sum(a+b) over the cross pairs = R*sum_i(a) + R*sum_j(b)
      val k = 3L
      val aSum = (0L until 50L).map(i => (k * 7919 + i * 104729) % 100000).sum
      val bSum = (0L until 50L).map(j => (k * 104729 + j * 7919) % 50000).sum
      val row = got.find(_._1 == k).get
      assert(row._2 === 2500L)
      assert(row._3 === 50L * aSum + 50L * bSum)
    }
  }

  test("q306 sketch estimates track the exact overlaps") {
    // sf0.01: 150 distinct users per type, unions > k=64, so the
    // ESTIMATOR path (not the exact small-set path) is what's tested
    val d = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q306_kmv_set_ops")(spark, d).collect()
    assert(rows.length === 10) // C(5,2) type pairs
    Tables.registerAll(spark, d)
    val exact = spark.sql(
      """SELECT a.event_type AS ta, b.event_type AS tb,
        |  count(DISTINCT CASE WHEN a.user_id = b.user_id
        |    THEN a.user_id END) AS inter
        |FROM (SELECT DISTINCT event_type, user_id FROM events
        |      WHERE user_id IS NOT NULL) a
        |JOIN (SELECT DISTINCT event_type, user_id FROM events
        |      WHERE user_id IS NOT NULL) b
        |  ON a.event_type < b.event_type AND a.user_id = b.user_id
        |GROUP BY 1, 2""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val estInter = r.getLong(5)
      val truth = exact.getOrElse(key, 0L)
      // k=64 sketch over ~150-user segments: generous 50% relative
      // tolerance plus small absolute slack — catches broken math
      // (orders of magnitude off), not sampling noise
      assert(math.abs(estInter - truth) <= math.max(20L, truth / 2),
        s"$key: est_inter=$estInter vs exact=$truth")
    }
  }

  test("q304 rule declines a measure the MV does not cover") {
    operators.OptimizerOps.buildAndRegisterMv(spark, dir)
    operators.OptimizerOps.ensureMvRule(spark)
    spark.conf.set("spark.graft.mvRewrite", "true")
    try {
      val notCovered = Tables.load(spark, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(sum(col("l_quantity").cast(DecimalType(12, 2))).as("qty"))
      assert(scanPaths(notCovered).exists(_.endsWith("lineitem.parquet")),
        "sum(l_quantity) is not in the MV; the rewrite must decline")
    } finally spark.conf.set("spark.graft.mvRewrite", "false")
  }

  test("q304 rule declines duplicate-sensitive aggregates over a dim column") {
    // count(dim) / avg(dim) reference ONLY MV-covered columns, so a
    // references-based check alone would let them through — but they
    // are duplicate-sensitive: aggregating over MV group rows instead
    // of fact rows gives wrong answers. The rule must fail closed.
    operators.OptimizerOps.buildAndRegisterMv(spark, dir)
    operators.OptimizerOps.ensureMvRule(spark)
    spark.conf.set("spark.graft.mvRewrite", "true")
    try {
      val fact = Tables.load(spark, dir, "lineitem")
      for (agg <- Seq(
          count(col("l_returnflag")).as("n"),
          avg(length(col("l_returnflag"))).as("a"))) {
        val df = fact.groupBy("l_returnflag").agg(agg)
        assert(scanPaths(df).exists(_.endsWith("lineitem.parquet")),
          s"duplicate-sensitive $agg over a dim must still scan the fact table")
      }
      // and the values must match the rule-off truth
      val dup = fact.groupBy("l_returnflag")
        .agg(count(col("l_returnflag")).as("n")).orderBy("l_returnflag")
      val got = dup.collect().map(r => (r.getString(0), r.getLong(1)))
      spark.conf.set("spark.graft.mvRewrite", "false")
      val want = fact.groupBy("l_returnflag")
        .agg(count(col("l_returnflag")).as("n")).orderBy("l_returnflag")
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(got.toSeq === want.toSeq)
    } finally spark.conf.set("spark.graft.mvRewrite", "false")
  }
}
