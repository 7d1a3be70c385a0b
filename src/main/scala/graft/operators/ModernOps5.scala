package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.plans.{GraftMv, MvRewriteRule}

/** Round-9 surfaces, part 5 — optimizer-owned query acceleration:
  *
  *  - q304 materialized-view rollup rewrite: a Catalyst
  *    `Rule[LogicalPlan]` ([[graft.plans.MvRewriteRule]]) that answers
  *    a fact-table GROUP BY from a registered pre-aggregate when the
  *    grouping keys are a subset of the MV's dimensions and every
  *    aggregate decomposes (`sum` → sum of partial sums, `count(*)` →
  *    sum of partial counts). The user query never mentions the MV —
  *    the substitution is the optimizer's, which is what makes MVs
  *    deployable: queries stay written against the fact table while
  *    the scan cost drops by the MV's compression ratio.
  */
object ModernOps5 {

  private[graft] def ensureMvRule(s: SparkSession): Unit =
    if (!s.experimental.extraOptimizations.contains(MvRewriteRule))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ MvRewriteRule

  /** Build the daily pre-aggregate and register it; returns its path.
    * The MV keeps (returnflag × ship-day) granularity — ~7 × 2500 rows
    * standing in for the fact table's millions — so any rollup to a
    * dim subset re-aggregates thousands of rows, not the fact scan. */
  private[graft] def buildAndRegisterMv(
      s: SparkSession, dir: String): String = {
    val mvPath = java.nio.file.Files
      .createTempDirectory("graft_q304_mv").toString
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), to_date(col("l_shipdate")).as("ship_day"))
      .agg(
        sum(col("l_extendedprice").cast(DecimalType(12, 2))).as("sum_price"),
        count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(mvPath)
    val mvScan = s.read.parquet(mvPath)
    MvRewriteRule.register(GraftMv(
      factSuffix = "lineitem.parquet",
      dims = Set("l_returnflag"),
      sums = Map("l_extendedprice" -> ("sum_price", DecimalType(12, 2))),
      cntCol = "cnt",
      mv = mvScan.queryExecution.analyzed))
    mvPath
  }

  /** The user-facing rollup, written against the FACT table. Exposed
    * so the spec can inspect the executed plan while the rewrite conf
    * is on. */
  private[graft] def mvRollupFrame(
      s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        sum(col("l_extendedprice").cast(DecimalType(12, 2))).as("rev_d"),
        count(lit(1)).as("n_items"))
      .select(col("l_returnflag"),
        col("rev_d").cast("string").as("revenue"), col("n_items"))
      .orderBy("l_returnflag")

  /** MV rewrite end-to-end: build + register the pre-agg, enable the
    * rule, run the fact-table rollup — the optimizer redirects it to
    * the MV (spec pins the scan path swap and the negative control: a
    * non-covered measure still scans the fact). Materialized via
    * localCheckpoint INSIDE the conf window (plans finalize at
    * execution; the checkpoint holds the handful of rollup rows). The
    * oracle aggregates the base table — the rewrite must be invisible
    * in the values. */
  private val q304 = Q(
    "q304_mv_rollup_rewrite",
    """SELECT l_returnflag,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR)
      |    AS revenue,
      |  CAST(count(*) AS BIGINT) AS n_items
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    buildAndRegisterMv(s, dir)
    ensureMvRule(s)
    s.conf.set("spark.graft.mvRewrite", "true")
    try mvRollupFrame(s, dir).localCheckpoint()
    finally s.conf.set("spark.graft.mvRewrite", "false")
  }

  // ------------- q305: storage-partitioned join (SPJ, zero exchanges)

  /** SPJ conf window: v2 bucketing on (the SPJ master switch) and
    * broadcast off so the join would otherwise shuffle both sides. */
  private[graft] def withSpjConfs[T](s: SparkSession)(body: => T): T = {
    val keys = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) => k -> s.conf.getOption(k) }
    keys.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  private val SpjKeys = 8
  private val SpjRows = 50L

  /** The two co-partitioned DSv2 tables joined on their storage key.
    * Exposed so the spec can assert zero exchanges in the executed
    * plan while the confs are on. */
  private[graft] def spjFrame(s: SparkSession): DataFrame = {
    def side(m1: Long, m2: Long, m3: Long) = s.read
      .format("graft.sources.KeyedSource")
      .option("keys", SpjKeys).option("rowsPerKey", SpjRows)
      .option("m1", m1).option("m2", m2).option("m3", m3)
      .load()
    val a = side(7919, 104729, 100000).toDF("k", "a_val")
    val b = side(104729, 7919, 50000).toDF("k", "b_val")
    a.join(b, "k")
      .groupBy("k")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("a_val") + col("b_val")).as("total"))
      .orderBy("k")
  }

  /** Storage-partitioned join: both [[graft.sources.KeyedSource]]
    * scans report `KeyGroupedPartitioning(identity(k))` and every
    * split carries its key, so Spark joins them split-by-split with
    * ZERO exchanges — the DSv2 half of Iceberg/Delta bucketed joins.
    * The spec pins the exchange-free plan; the oracle regenerates both
    * synthetic relations from range() and joins them the plain way. */
  private val q305 = Q(
    "q305_storage_partitioned_join",
    s"""WITH a AS (
       |  SELECT kk.range AS k,
       |    (kk.range * 7919 + i.range * 104729) % 100000 AS a_val
       |  FROM range($SpjKeys) kk, range($SpjRows) i),
       |b AS (
       |  SELECT kk.range AS k,
       |    (kk.range * 104729 + j.range * 7919) % 50000 AS b_val
       |  FROM range($SpjKeys) kk, range($SpjRows) j)
       |SELECT a.k AS k, CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum(a_val + b_val) AS BIGINT) AS total
       |FROM a JOIN b ON a.k = b.k
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, _) =>
    withSpjConfs(s) { spjFrame(s).localCheckpoint() }
  }

  // ------------- q306: KMV sketch set operations (audience overlap)

  private val SetK = 64
  private val SetM = 1000000007L

  /** Theta/KMV-style set-operation estimates: per event_type, a
    * bottom-[[SetK]] sketch of hashed distinct users; per type PAIR,
    * the union sketch (bottom-k of the merged sketches) estimates
    * |A∪B|, the fraction of union-sketch keys present in BOTH input
    * sketches estimates Jaccard, and their product estimates |A∩B| —
    * the DataSketches workflow that answers audience-overlap questions
    * from k rows per segment instead of re-scanning users. Estimates
    * are exact integers ((k-1)*M div h_k and ratio arithmetic), the
    * hash is sign-normalized and pre-reduced so no term overflows
    * BIGINT in either engine, and a sketch smaller than k IS the exact
    * set (count path) — the oracle replays all of it bit-for-bit.
    *
    * Scale shape: one distinct over (type, user) is the only wide
    * shuffle; sketches are k rows per segment (here 5×64), so every
    * pairwise op is broadcast-sized no matter how large the corpus —
    * that asymmetry is the whole point of sketch set ops at 100 TB.
    * ModernOps5Spec pins the estimates against the exact overlaps. */
  private val q306 = Q(
    "q306_kmv_set_ops",
    s"""WITH du AS (
       |  SELECT DISTINCT event_type AS t,
       |    (((user_id % $SetM) * 2654435761) % $SetM + $SetM) % $SetM AS h
       |  FROM events WHERE user_id IS NOT NULL),
       |sk AS (
       |  SELECT t, h FROM (
       |    SELECT t, h, row_number() OVER (PARTITION BY t ORDER BY h) AS rn
       |    FROM du) WHERE rn <= $SetK),
       |est AS (
       |  SELECT t, CASE WHEN count(*) < $SetK THEN count(*)
       |    ELSE ${(SetK - 1) * SetM} // max(h) END AS est
       |  FROM sk GROUP BY t),
       |pairs AS (SELECT a.t AS ta, b.t AS tb FROM est a JOIN est b ON a.t < b.t),
       |pu AS (
       |  SELECT p.ta, p.tb, s.h FROM pairs p JOIN sk s ON s.t = p.ta OR s.t = p.tb
       |  GROUP BY 1, 2, 3),
       |pu64 AS (
       |  SELECT ta, tb, h FROM (
       |    SELECT ta, tb, h, row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
       |    FROM pu) WHERE rn <= $SetK),
       |m AS (
       |  SELECT u.ta, u.tb, count(*) AS ku,
       |    CASE WHEN count(*) < $SetK THEN count(*)
       |      ELSE ${(SetK - 1) * SetM} // max(u.h) END AS est_u,
       |    count(*) FILTER (WHERE sa.h IS NOT NULL AND sb.h IS NOT NULL) AS mt
       |  FROM pu64 u
       |  LEFT JOIN sk sa ON sa.t = u.ta AND sa.h = u.h
       |  LEFT JOIN sk sb ON sb.t = u.tb AND sb.h = u.h
       |  GROUP BY 1, 2)
       |SELECT m.ta AS type_a, m.tb AS type_b,
       |  CAST(ea.est AS BIGINT) AS est_a, CAST(eb.est AS BIGINT) AS est_b,
       |  CAST(m.est_u AS BIGINT) AS est_union,
       |  CAST(m.mt * m.est_u // m.ku AS BIGINT) AS est_inter,
       |  CAST(m.mt * 1000000 // m.ku AS BIGINT) AS jacc_ppm
       |FROM m JOIN est ea ON ea.t = m.ta JOIN est eb ON eb.t = m.tb
       |ORDER BY type_a, type_b""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val du = Tables.load(s, dir, "events")
      .filter(col("user_id").isNotNull)
      .select(col("event_type").as("t"),
        expr(s"(((user_id % $SetM) * 2654435761) % $SetM + $SetM) % $SetM")
          .as("h"))
      .distinct()
    val sk = du
      .withColumn("rn", row_number().over(
        Window.partitionBy("t").orderBy("h")))
      .filter(col("rn") <= SetK).select("t", "h")
      .localCheckpoint() // k rows per segment: reused 4x below
    val estCase =
      s"CASE WHEN count(*) < $SetK THEN count(*) " +
        s"ELSE ${(SetK - 1) * SetM} div max(h) END"
    val est = sk.groupBy("t").agg(expr(estCase).as("est"))
    val pairs = est.select(col("t").as("ta"))
      .join(est.select(col("t").as("tb")), col("ta") < col("tb"))
    val pu = pairs
      .withColumn("t", explode(array(col("ta"), col("tb"))))
      .join(broadcast(sk), "t")
      .select("ta", "tb", "h").distinct()
    val pu64 = pu
      .withColumn("rn", row_number().over(
        Window.partitionBy("ta", "tb").orderBy("h")))
      .filter(col("rn") <= SetK).select("ta", "tb", "h")
    val skA = sk.select(col("t").as("ta"), col("h"), lit(1).as("in_a"))
    val skB = sk.select(col("t").as("tb"), col("h"), lit(1).as("in_b"))
    val m = pu64
      .join(broadcast(skA), Seq("ta", "h"), "left")
      .join(broadcast(skB), Seq("tb", "h"), "left")
      .groupBy("ta", "tb")
      .agg(
        count(lit(1)).as("ku"),
        expr(s"CASE WHEN count(*) < $SetK THEN count(*) " +
          s"ELSE ${(SetK - 1) * SetM} div max(h) END").as("est_u"),
        count_if(col("in_a").isNotNull && col("in_b").isNotNull).as("mt"))
    m.join(broadcast(est.select(col("t").as("ta"), col("est").as("est_a"))), "ta")
      .join(broadcast(est.select(col("t").as("tb"), col("est").as("est_b"))), "tb")
      .select(col("ta").as("type_a"), col("tb").as("type_b"),
        col("est_a"), col("est_b"),
        col("est_u").as("est_union"),
        expr("mt * est_u div ku").as("est_inter"),
        expr("mt * 1000000 div ku").as("jacc_ppm"))
      .orderBy("type_a", "type_b")
  }

  val defs: Seq[Q] = Seq(q304, q305, q306)
}
