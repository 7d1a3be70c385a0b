package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-9 surfaces, part 27 — correlated scalars, OR-join
  * decomposition, and range-checksum sync:
  *
  *  - q365 correlated scalar subqueries: per-order `(SELECT max(...))`
  *    and `(SELECT count(*))` against lineitem in the SELECT list —
  *    Catalyst's RewriteCorrelatedScalarSubquery turns each into a
  *    left-outer aggregate join, so the declarative form stays
  *    hash-join-shaped at scale; NULL-on-empty pinned via coalesce;
  *  - q366 OR-predicate semi join: `EXISTS (… k1-match OR k2-match)`
  *    cannot hash-join (no single equi key → nested loop). The scale
  *    rewrite: a UNION of the two single-key SEMI joins (set union on
  *    the probe side is exactly OR-exists semantics, duplicate-free
  *    because semi joins never multiply rows). The Spark side runs the
  *    decomposed form, the DuckDB oracle runs the raw OR-EXISTS — the
  *    hash gate proves the rewrite; the spec pins the no-nested-loop
  *    plan;
  *  - q367 Merkle-style range sync: both q355 snapshots summarized per
  *    key-range bucket (k div 64) by count + an order-independent
  *    arithmetic checksum; emitting only buckets whose (n, checksum)
  *    differ localizes WHERE two 100 TB tables diverge while moving
  *    only #buckets rows — the anti-entropy pass that runs before the
  *    expensive row-level diff (q355).
  */
object ModernOps27 {

  // ------------- q365: correlated scalar subqueries

  private val q365 = Q(
    "q365_correlated_scalar",
    """WITH o AS (
      |  SELECT o_orderkey, o_orderpriority, o_orderdate,
      |    (SELECT max(l.l_shipdate) FROM lineitem l
      |     WHERE l.l_orderkey = o_orderkey) AS last_ship,
      |    (SELECT count(*) FROM lineitem l
      |     WHERE l.l_orderkey = o_orderkey) AS n_items
      |  FROM orders
      |  WHERE o_orderkey IS NOT NULL AND o_orderdate IS NOT NULL)
      |SELECT o_orderpriority,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CASE WHEN last_ship IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_unshipped,
      |  CAST(sum(coalesce(datediff('day', CAST(o_orderdate AS DATE),
      |    CAST(last_ship AS DATE)), 0)) AS BIGINT) AS lag_days,
      |  CAST(sum(coalesce(n_items, 0)) AS BIGINT) AS items
      |FROM o GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "orders").createOrReplaceTempView("g_q365_orders")
    Tables.load(s, dir, "lineitem")
      .createOrReplaceTempView("g_q365_lineitem")
    s.sql(
      """WITH o AS (
        |  SELECT o_orderkey, o_orderpriority, o_orderdate,
        |    (SELECT max(l.l_shipdate) FROM g_q365_lineitem l
        |     WHERE l.l_orderkey = o_orderkey) AS last_ship,
        |    (SELECT count(*) FROM g_q365_lineitem l
        |     WHERE l.l_orderkey = o_orderkey) AS n_items
        |  FROM g_q365_orders
        |  WHERE o_orderkey IS NOT NULL AND o_orderdate IS NOT NULL)
        |SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CASE WHEN last_ship IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_unshipped,
        |  CAST(sum(coalesce(datediff(CAST(last_ship AS DATE),
        |    CAST(o_orderdate AS DATE)), 0)) AS BIGINT) AS lag_days,
        |  CAST(sum(coalesce(n_items, 0)) AS BIGINT) AS items
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  // ------------- q366: OR-predicate semi join → union of semi joins

  private val q366 = Q(
    "q366_or_semi_union",
    """WITH c AS (
      |  SELECT c_custkey AS k, c_mktsegment AS seg FROM customer
      |  WHERE c_custkey IS NOT NULL),
      |o AS (
      |  SELECT o_custkey AS direct_k, o_orderkey % 1500 AS referral_k
      |  FROM orders WHERE o_custkey IS NOT NULL)
      |SELECT c.seg, CAST(count(*) AS BIGINT) AS n_matched
      |FROM c
      |WHERE EXISTS (SELECT 1 FROM o
      |  WHERE o.direct_k = c.k OR o.referral_k = c.k)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val c = Tables.load(s, dir, "customer")
      .filter(col("c_custkey").isNotNull)
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"))
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_custkey").isNotNull)
      .select(col("o_custkey").as("direct_k"),
        (col("o_orderkey") % 1500).as("referral_k"))
    // OR-EXISTS decomposed: each disjunct is a hash LEFT SEMI join on
    // its own key; the union of the two probe-side row sets (dedup by
    // the customer key — semi joins never duplicate) IS the OR
    val byDirect = c.join(o, c("k") === o("direct_k"), "left_semi")
    val byReferral = c.join(o, c("k") === o("referral_k"), "left_semi")
    byDirect.unionByName(byReferral).distinct()
      .groupBy("seg")
      .agg(count(lit(1)).as("n_matched"))
      .select(col("seg"), col("n_matched").cast("long").as("n_matched"))
      .orderBy("seg")
  }

  /** The naive OR-EXISTS form, exposed for the spec's plan contrast. */
  private[graft] def orExistsNaive(
      s: org.apache.spark.sql.SparkSession, dir: String) = {
    val c = Tables.load(s, dir, "customer")
      .filter(col("c_custkey").isNotNull)
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"))
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_custkey").isNotNull)
      .select(col("o_custkey").as("direct_k"),
        (col("o_orderkey") % 1500).as("referral_k"))
    c.join(o, c("k") === o("direct_k") || c("k") === o("referral_k"),
      "left_semi")
      .groupBy("seg")
      .agg(count(lit(1)).as("n_matched"))
      .select(col("seg"), col("n_matched").cast("long").as("n_matched"))
      .orderBy("seg")
  }

  // ------------- q367: Merkle-style range-checksum sync

  private val q367 = Q(
    "q367_merkle_sync",
    """WITH base AS (
      |  SELECT o_orderkey AS k,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders WHERE o_orderkey IS NOT NULL),
      |a AS (SELECT * FROM base WHERE k % 89 <> 0),
      |b AS (
      |  SELECT k,
      |    cents + CASE WHEN k % 31 = 0 THEN 100 ELSE 0 END AS cents
      |  FROM base WHERE k % 97 <> 0),
      |ha AS (
      |  -- offset keeps the dividend non-negative: Spark div truncates
      |  -- where DuckDB // floors, so negatives would split buckets
      |  SELECT (k + 1073741824) // 64 AS bucket, count(*) AS n,
      |    sum((cents % 1000003) * (k % 997 + 1)) AS cs
      |  FROM a GROUP BY 1),
      |hb AS (
      |  SELECT (k + 1073741824) // 64 AS bucket, count(*) AS n,
      |    sum((cents % 1000003) * (k % 997 + 1)) AS cs
      |  FROM b GROUP BY 1)
      |SELECT coalesce(ha.bucket, hb.bucket) AS bucket,
      |  CAST(coalesce(ha.n, 0) AS BIGINT) AS n_a,
      |  CAST(coalesce(hb.n, 0) AS BIGINT) AS n_b,
      |  CAST(coalesce(ha.cs, 0) AS BIGINT) AS cs_a,
      |  CAST(coalesce(hb.cs, 0) AS BIGINT) AS cs_b
      |FROM ha FULL OUTER JOIN hb ON ha.bucket = hb.bucket
      |WHERE ha.bucket IS NULL OR hb.bucket IS NULL
      |  OR ha.n <> hb.n OR ha.cs <> hb.cs
      |ORDER BY 1""".stripMargin) { (s, dir) =>
    val base = Tables.load(s, dir, "orders")
      .filter(col("o_orderkey").isNotNull)
      .select(col("o_orderkey").as("k"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast("long")
          .as("cents"))
    val a = base.filter(col("k") % 89 =!= 0)
    val b = base.filter(col("k") % 97 =!= 0)
      .select(col("k"),
        (col("cents") + when(col("k") % 31 === 0, 100L).otherwise(0L))
          .as("cents"))
    def digest(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(expr("(k + 1073741824) div 64").as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(expr("(cents % 1000003) * (k % 997 + 1)")).as("cs"))
    digest(a).as("ha")
      .join(digest(b).as("hb"), Seq("bucket"), "full")
      .select(col("bucket"),
        coalesce(col("ha.n"), lit(0L)).as("n_a"),
        coalesce(col("hb.n"), lit(0L)).as("n_b"),
        coalesce(col("ha.cs"), lit(0L)).as("cs_a"),
        coalesce(col("hb.cs"), lit(0L)).as("cs_b"))
      .filter(col("n_a") =!= col("n_b") || col("cs_a") =!= col("cs_b"))
      .select(col("bucket").cast("long").as("bucket"), col("n_a"),
        col("n_b"), col("cs_a"), col("cs_b"))
      .orderBy("bucket")
  }

  val defs: Seq[Q] = Seq(q365, q366, q367)
}
