package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Sketches + skew patterns: Count-Min Sketch frequency estimation (a
  * custom TypedImperativeAggregate) and salted two-phase aggregation
  * (the skew-mitigation pattern, verified to produce exact results).
  */
object SketchOps {

  private[graft] val Depth = 4
  private[graft] val Width = 1024
  private[graft] val P = 2038074743L
  private[graft] val (cmsA, cmsB) = {
    val rnd = new scala.util.Random(99)
    (Array.fill(Depth)(1L + rnd.nextInt((P - 1).toInt)),
      Array.fill(Depth)(rnd.nextInt(P.toInt).toLong))
  }

  private def bucketSql(i: Int, x: String): String =
    // CAST keeps the literals BIGINT in both engines (a bare 2e9-ish
    // literal parses as INT in Spark and overflows under ANSI).
    s"(CAST(${cmsA(i)} AS BIGINT) * $x + ${cmsB(i)}) % $P % $Width"

  private val q92 = Q(
    "q92_cms_frequency",
    { // DuckDB oracle: per probe key, the true count of every key
      // colliding into the probe's bucket, min over the d hash rows —
      // exactly the CMS estimate, computed directly.
      val perRow = (0 until Depth).map { i =>
        s"""SELECT $i AS i, ${bucketSql(i, "l_partkey")} AS bkt, COUNT(*) AS c
           |FROM lineitem GROUP BY 2""".stripMargin
      }.mkString("\nUNION ALL\n")
      val probeJoin = (0 until Depth).map { i =>
        s"COALESCE((SELECT c FROM cnt WHERE i = $i AND bkt = ${bucketSql(i, "k")}), 0)"
      }.mkString("LEAST(", ", ", ")")
      s"""WITH cnt AS ($perRow),
         |probes AS (SELECT unnest(range(1, 21)) AS k)
         |SELECT CAST(k AS INT) AS k, CAST($probeJoin AS BIGINT) AS est_count
         |FROM probes ORDER BY k""".stripMargin
    }) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms",
      exprs => graft.functions.CountMinSketchAgg(
        exprs.head, Depth, Width, cmsA, cmsB, P).toAggregateExpression(),
      "scala_udf")
    val est = (0 until Depth).map { i =>
      s"cms[CAST(${bucketSql(i, "k")} + $i * $Width AS INT)]"
    }.mkString("LEAST(", ", ", ")")
    s.sql(
      s"""WITH sk AS (SELECT graft_cms(l_partkey) AS cms FROM lineitem),
         |probes AS (SELECT explode(sequence(1, 20)) AS k)
         |SELECT k, CAST($est AS BIGINT) AS est_count
         |FROM probes CROSS JOIN sk ORDER BY k""".stripMargin)
  }

  private val q93 = Q(
    "q93_salted_agg",
    """SELECT l_suppkey, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
      |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin) { (s, dir) =>
    // Skew mitigation: salt the hot key into 8 sub-keys, aggregate
    // partially per (key, salt), then combine — same exact result as a
    // direct groupBy (decimal sums are order-independent), but the first
    // shuffle spreads a hot key over 8 reducers at 100 TB.
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(12, 2))
    val salted = Tables.load(s, dir, "lineitem")
      .withColumn("salt", pmod(col("l_orderkey") + col("l_linenumber"), lit(8)))
      .groupBy("l_suppkey", "salt")
      .agg(count(lit(1)).as("pn"), sum(dec(col("l_quantity"))).as("pq"))
    salted.groupBy("l_suppkey")
      .agg(sum(col("pn")).as("n"), sum(col("pq")).cast("double").as("total_qty"))
      .orderBy("l_suppkey")
  }

  /** Grouped top-k WITHOUT a window sort: TopKAgg keeps a k-bounded
    * best-first buffer per group, so map-side partial aggregation
    * prunes to <= k rows per (group, partition) before the shuffle —
    * `row_number() OVER (...)` shuffles and sorts EVERY row of every
    * group, which is the difference at 100 TB between moving k rows
    * per group and moving the corpus. */
  private val q178 = Q(
    "q178_grouped_topk",
    """SELECT o_custkey, CAST(rn AS INT) AS rnk, o_orderkey, o_totalprice
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        row_number() OVER (PARTITION BY o_custkey
      |                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |      FROM orders WHERE o_totalprice IS NOT NULL)
      |WHERE rn <= 3 ORDER BY o_custkey, rnk""".stripMargin) { (s, dir) =>
    graft.Tables.registerAll(s, dir)
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk",
      exprs => graft.functions.TopKAgg(exprs(0), exprs(1), 3).toAggregateExpression(),
      "scala_udf")
    s.sql(
      """WITH t AS (SELECT o_custkey, graft_topk(o_totalprice, o_orderkey) AS top
        |           FROM orders GROUP BY o_custkey)
        |SELECT o_custkey, CAST(pos + 1 AS INT) AS rnk,
        |  elem.id AS o_orderkey, elem.v AS o_totalprice
        |FROM t LATERAL VIEW posexplode(top) x AS pos, elem
        |ORDER BY o_custkey, rnk""".stripMargin)
  }

  val defs: Seq[Q] = Seq(q92, q93, q178)
}
