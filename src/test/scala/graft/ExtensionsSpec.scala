package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions attaches the library through the standard
  * `spark.sql.extensions` hook: the as-of planner strategy and the
  * codegen function surface must work on a session that nothing
  * registered on at runtime. Builds a separate SparkSession over the
  * shared SparkContext (never stops it — other suites use it). */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions wires functions and as-of strategy") {
    TestSpark.spark // ensure the shared context exists first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // spark.sql.extensions is a STATIC conf — it only applies when the
      // SparkContext is created, and the suite shares one; withExtensions
      // exercises the identical injection path on a reused context.
      val spark = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      import spark.implicits._
      // codegen function registered by the injected resolution rule
      val dot = spark.sql(
        "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .as[Double].head()
      assert(dot == 1.0 * 3.0 + 2.0 * 4.0)
      // the WHOLE function surface is injected, not just graft_dot
      assert(spark.sql("SELECT size(graft_minhash(array(1L, 2L))) AS n")
        .as[Int].head() == 64)
      assert(spark.sql("SELECT size(graft_cms(x)) AS n FROM VALUES (1L), (2L) t(x)")
        .as[Int].head() > 0)
      assert(spark.sql("SELECT graft_strip_accents(graft_nfc('café')) AS s")
        .as[String].head() == "cafe")
      assert(spark.sql(
        "SELECT graft_polyhash('ab', 7L, 31L, 97L) AS h").as[Long].head() ==
        ((7L * 31 + 'a') % 97 * 31 + 'b') % 97)
      // bounded top-k aggregate through the extension route
      val top = spark.sql(
        """SELECT graft_topk(v, id, 2) AS t
          |FROM VALUES (1.0D, 1L), (3.0D, 2L), (2.0D, 3L) AS t(v, id)""".stripMargin)
        .selectExpr("transform(t, x -> x.id) AS ids").as[Seq[Long]].head()
      assert(top == Seq(2L, 3L))
      // as-of join planned by the INJECTED strategy: build the logical
      // node directly — no AsOfJoinApi.register fallback to mask it.
      val left = Seq((1L, 10L), (1L, 20L)).toDF("k", "t")
      val right = Seq((1L, 5L, "a"), (1L, 15L, "b")).toDF("rk", "rt", "v")
      import org.apache.spark.sql.graftbridge.Bridge
      val plan = plans.AsOfJoin(
        left.queryExecution.analyzed, right.queryExecution.analyzed,
        Bridge.expr(left.col("k")), Bridge.expr(right.col("rk")),
        Bridge.expr(left.col("t")), Bridge.expr(right.col("rt")))
      val joined = Bridge.ofRows(spark, plan)
      val rows = joined.orderBy("t").collect().map(r => (r.getLong(1), r.getString(4)))
      assert(rows.toSeq == Seq((10L, "a"), (20L, "b")))
      assert(joined.queryExecution.executedPlan.toString.contains("AsOfJoin"))
      // levenshtein threshold rule injected by the extension: the
      // <= k filter optimizes to the banded 3-arg form, same rows.
      val fuzzy = spark.sql(
        """SELECT a.s, b.s FROM VALUES ('abc'), ('abd'), ('xyz') AS a(s)
          |CROSS JOIN VALUES ('abc'), ('abd'), ('xyz') AS b(s)
          |WHERE levenshtein(a.s, b.s) <= 1 AND a.s < b.s""".stripMargin)
      assert(fuzzy.queryExecution.optimizedPlan.toString
        .contains("levenshtein(s#"), "levenshtein gone from the plan?")
      assert(fuzzy.queryExecution.optimizedPlan.toString.contains("Some(1)) >= 0"),
        "threshold not pushed into levenshtein:\n" +
          fuzzy.queryExecution.optimizedPlan.toString)
      assert(fuzzy.collect().map(r => (r.getString(0), r.getString(1))).toSet
        === Set(("abc", "abd")))
      // All four comparison spellings rewrite; strict < shifts to k-1.
      val lt = spark.sql(
        "SELECT levenshtein('ab', 'ac') < 2 AS x")
      assert(lt.queryExecution.optimizedPlan.toString.contains("Some(1)) >= 0") ||
        lt.as[Boolean].head(), "LessThan spelling not handled")
      // dialect parser injected: spark.sql accepts TOP-n / SEL / QUALIFY
      val topn = spark.sql(
        "SELECT TOP 2 x FROM VALUES (3), (1), (2) t(x) ORDER BY x")
        .as[Int].collect().toSeq
      assert(topn == Seq(1, 2), "T-SQL TOP not rewritten by the parser extension")
      val sel = spark.sql("SEL 41 + 1 AS v").as[Int].head()
      assert(sel == 42, "Teradata SEL not rewritten")
      val qual = spark.sql(
        """SELECT x, rank() OVER (ORDER BY x) AS r
          |FROM VALUES (3), (1), (2) t(x) QUALIFY r <= 2""".stripMargin)
        .selectExpr("x").as[Int].collect().toSet
      assert(qual == Set(1, 2), "QUALIFY not rewritten")
      // Teradata-isms that parse CLEANLY and only die at analysis:
      // 2-arg max/min (tree rewrite to greatest/least in the parser)
      val g = spark.sql("SELECT max(2, 5) AS g, min(2, 5) AS l")
        .collect().head
      assert((g.getInt(0), g.getInt(1)) == ((5, 2)),
        "2-arg max/min not rewritten to greatest/least")
      // …while real 1-arg aggregates and string literals stay native
      assert(spark.sql("SELECT max(x) FROM VALUES (1), (7) t(x)")
        .as[Int].head() == 7)
      assert(spark.sql("SELECT 'max(a,b)' AS s").as[String].head() == "max(a,b)")
      // bare ACTIVITY_COUNT resolves to the 0 register constant…
      assert(spark.sql("SELECT ACTIVITY_COUNT AS n").as[Long].head() == 0L)
      assert(spark.sql(
        "SELECT x + ACTIVITY_COUNT AS y FROM VALUES (4L) t(x)")
        .as[Long].head() == 4L)
      // …but a REAL column named activity_count always wins
      assert(spark.sql(
        "SELECT activity_count FROM VALUES (9L) t(activity_count)")
        .as[Long].head() == 9L)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
