package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.plans.{GraftMv, MvRewriteRule}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, SparkSession}

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


  // ------------- q281: approx_top_k sketch aggregate

  /** Spark 4's approx_top_k frequent-items sketch (space-bounded,
    * mergeable — the distributed heavy-hitters surface next to the
    * custom Misra-Gries in q191). k covers every distinct value here,
    * so the sketch is EXACT and the count-ordered output has no
    * boundary-tie ambiguity against the exact oracle. */
  private val q281 = Q(
    "q281_approx_top_k",
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n
      |FROM events GROUP BY event_type
      |ORDER BY n DESC, event_type""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT t.item AS event_type, CAST(t.count AS BIGINT) AS n
        |FROM (SELECT explode(tk) AS t
        |      FROM (SELECT approx_top_k(event_type, 5) AS tk FROM events))
        |ORDER BY n DESC, event_type""".stripMargin)
  }

  // ------------- q284: HLL sketch incremental distinct

  /** The incremental-distinct production pattern: per-day HLL sketches
    * (hll_sketch_agg — mergeable, constant-size state, map-side
    * partial) that roll up to a global distinct WITHOUT re-touching
    * raw data (hll_union_agg). The exact per-day totals are the
    * oracle-checked payload; the sketch estimates are pinned by
    * PROPERTY (within 5% of exact, a deterministic bound since HLL is
    * order-independent and deterministic for a fixed input set) — the
    * q121 property-oracle pattern for approximate operators. */
  private val q284 = Q(
    "q284_hll_incremental_distinct",
    """WITH daily AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
      |    count(DISTINCT user_id) AS exact_d
      |  FROM events GROUP BY 1)
      |SELECT CAST(count(*) AS BIGINT) AS n_days,
      |  CAST(sum(exact_d) AS BIGINT) AS sum_daily_distinct,
      |  TRUE AS daily_est_ok, TRUE AS union_est_ok
      |FROM daily""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """WITH daily AS (
        |  SELECT CAST(date_trunc('DAY', ts) AS DATE) AS day,
        |    hll_sketch_agg(user_id) AS sk,
        |    count(DISTINCT user_id) AS exact_d
        |  FROM events GROUP BY 1),
        |total AS (SELECT count(DISTINCT user_id) AS g FROM events)
        |SELECT CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(exact_d) AS BIGINT) AS sum_daily_distinct,
        |  bool_and(abs(hll_sketch_estimate(sk) - exact_d) <= 0.05 * exact_d)
        |    AS daily_est_ok,
        |  abs(hll_sketch_estimate(hll_union_agg(sk)) - first(total.g))
        |    <= 0.05 * first(total.g) AS union_est_ok
        |FROM daily CROSS JOIN total""".stripMargin)
  }

  // ------------- q294: mergeable KMV quantile sketch, hierarchical rollup

  /** Sketch size: 64 keys per group — the estimate's error is the
    * sampling error of a 64-row uniform sample. */
  private val KmvK = 64

  // a mergeable bottom-k (KMV-style) quantile sketch rolled up
  // a month→year→all hierarchy by RE-AGGREGATING the sketches, never
  // rescanning the base table.
  // Everything is deterministic under Spark's parallel partial
  // aggregation: candidate generation is equi-join-shaped, scores are
  // exact integers or order-independent doubles, and every tie has a
  // total order.
  /** A bottom-k (KMV) sketch as a MERGEABLE quantile summary: per
    * month, keep the [[KmvK]] order keys with the smallest
    * deterministic hash h = (o_orderkey * 2654435761) % 1000000007 — a
    * uniform sample whose merge (union, re-keep-bottom-k) is exact and
    * order-independent, unlike reservoir sampling. The median estimate
    * is the sample's lower median in exact integer cents. The year and
    * all levels NEVER rescan orders: they re-aggregate the month
    * sketches (<= 64 rows per month in, 64 out) — the hierarchy costs
    * O(groups * k) after the single base pass, which is the shape that
    * lets a 100 TB fact table keep per-level quantiles incrementally.
    * Price cents ride INSIDE the sketch id: packed = (cents + 1e10) *
    * 1e8 + o_orderkey — the 1e10-cent shift keeps packed NON-NEGATIVE
    * for negative prices, because integer division on negatives is
    * where engines disagree (Spark `div` truncates toward zero, DuckDB
    * `//` floors; the adversarial corpus's -99999.99 order caught
    * this). Domain contract: |price| <= 1e8 dollars and o_orderkey <
    * 1e8 (ANSI overflow fails loudly on both engines beyond it). Rows
    * with a NULL date or NULL price are excluded up front — standard
    * SQL aggregate semantics, pinned by the adversarial corpus's NULL
    * rows. No join back to the base is ever needed. The buffer is
    * [[graft.functions.TopKAgg]] on negated hash (O(k) state, map-side
    * pruned before the shuffle). Oracle: bottom-64 per level straight
    * off the base table — identical by the containment property
    * (the bottom-k of a union is contained in the union of bottom-ks). */
  private val q294 = Q(
    "q294_kmv_quantile_rollup",
    s"""WITH b AS (
       |  SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
       |    (o_orderkey * 2654435761) % 1000000007 AS h,
       |    (CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
       |      + 10000000000) * 100000000 + o_orderkey AS packed
       |  FROM orders
       |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL),
       |lv AS (
       |  SELECT 'month' AS level, printf('%04d-%02d', yr, mo) AS key,
       |    h, packed FROM b
       |  UNION ALL SELECT 'year', CAST(yr AS VARCHAR), h, packed FROM b
       |  UNION ALL SELECT 'all', 'all', h, packed FROM b),
       |cnt AS (SELECT level, key, count(*) AS n_rows FROM lv GROUP BY 1, 2),
       |sm AS (SELECT level, key, packed, row_number() OVER (
       |         PARTITION BY level, key ORDER BY h, packed) AS hr FROM lv),
       |sk AS (SELECT level, key, packed,
       |         row_number() OVER (PARTITION BY level, key
       |           ORDER BY packed) AS rn,
       |         count(*) OVER (PARTITION BY level, key) AS m
       |       FROM sm WHERE hr <= $KmvK)
       |SELECT c.level AS level, c.key AS key,
       |  CAST(c.n_rows AS BIGINT) AS n_rows,
       |  CAST(s.packed // 100000000 - 10000000000 AS BIGINT)
       |    AS est_median_cents
       |FROM cnt c JOIN sk s ON s.level = c.level AND s.key = c.key
       |  AND s.rn = (s.m + 1) // 2
       |ORDER BY level, key""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bottomk",
      exprs => graft.functions.TopKAgg(exprs(0), exprs(1), KmvK)
        .toAggregateExpression(),
      "scala_udf")
    // The month level is localCheckpoint'd: Catalyst inlines CTEs, so a
    // WITH-based spelling re-derives `mon` from the base scan at every
    // reference (the plan audit counted FIVE orders scans). The cut
    // materializes months once (tiny: groups x 64 pairs) and the year /
    // all levels genuinely re-aggregate sketches from it.
    val b = s.sql(
      """SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        |  CAST(-((o_orderkey * 2654435761) % 1000000007) AS DOUBLE)
        |    AS negh,
        |  (CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |    + 10000000000) * 100000000 + o_orderkey AS packed
        |FROM orders
        |WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL"""
        .stripMargin)
    val mon = b.groupBy("yr", "mo")
      .agg(count(lit(1)).as("n_rows"),
        expr("graft_bottomk(negh, packed)").as("sk"))
      .localCheckpoint()
    val yrLvl = mon.select(col("yr"), explode(col("sk")).as("e"))
      .groupBy("yr").agg(expr("graft_bottomk(e.v, e.id)").as("sk"))
      .join(mon.groupBy("yr").agg(sum("n_rows").as("n_rows")), "yr")
      .localCheckpoint()
    val alLvl = yrLvl.select(explode(col("sk")).as("e"))
      .agg(expr("graft_bottomk(e.v, e.id)").as("sk"))
      .crossJoin(yrLvl.agg(sum("n_rows").as("n_rows")))
    val u = mon.select(lit("month").as("level"),
        format_string("%04d-%02d", col("yr"), col("mo")).as("key"),
        col("n_rows"), col("sk"))
      .unionAll(yrLvl.select(lit("year").as("level"),
        col("yr").cast("string").as("key"), col("n_rows"), col("sk")))
      .unionAll(alLvl.select(lit("all").as("level"), lit("all").as("key"),
        col("n_rows"), col("sk")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("level", "key").orderBy("packed")
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy("level", "key")
    u.select(col("level"), col("key"), col("n_rows"),
        explode(col("sk")).as("e"))
      .select(col("level"), col("key"), col("n_rows"),
        col("e.id").as("packed"))
      .withColumn("rn", row_number().over(w))
      .withColumn("m", count(lit(1)).over(wAll))
      .filter(expr("rn = (m + 1) div 2"))
      .select(col("level"), col("key"), col("n_rows"),
        expr("packed div 100000000 - 10000000000").as("est_median_cents"))
      .orderBy("level", "key")
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

  // ------------- q318: histogram-based join cardinality estimation

  private val HistBuckets = 16

  // histogram-based join cardinality estimation: fixed-width
  // per-bucket (count, ndv) stats on both join sides, the classic
  // `n1·n2 / max(d1,d2)` estimate vs the ACTUAL per-bucket join count
  // — the optimizer-statistics surface, verifiable end to end.
  /** Per-bucket (count, ndv) histograms on both sides of the
    * orders ⋈ customer key, the uniform-within-bucket estimate
    * `n1·n2 div max(d1,d2)`, and the ACTUAL per-bucket join count next
    * to it — the statistics pipeline every cost-based optimizer runs,
    * with its error measurable. Bucket width derives from max(custkey)
    * so the histogram scales with the corpus. Scope: non-negative
    * keys (floor- vs truncate-division diverges across engines on
    * negatives; both sides exclude them explicitly). Stats collection is one
    * aggregate per side; the actual count is the real join, only for
    * verification. */
  private val q318 = Q(
    "q318_histogram_join_estimate",
    s"""WITH w AS (
       |  SELECT greatest(CAST(max(c_custkey) AS BIGINT) // $HistBuckets, 1)
       |    AS bw FROM customer),
       |h1 AS (
       |  SELECT o_custkey // bw AS b, count(*) AS n1,
       |    count(DISTINCT o_custkey) AS d1
       |  FROM orders CROSS JOIN w
       |  WHERE o_custkey IS NOT NULL AND o_custkey >= 0 GROUP BY 1),
       |h2 AS (
       |  SELECT c_custkey // bw AS b, count(*) AS n2,
       |    count(DISTINCT c_custkey) AS d2
       |  FROM customer CROSS JOIN w
       |  WHERE c_custkey IS NOT NULL AND c_custkey >= 0 GROUP BY 1),
       |act AS (
       |  SELECT o.o_custkey // bw AS b, count(*) AS actual
       |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       |  CROSS JOIN w WHERE o.o_custkey >= 0 GROUP BY 1)
       |SELECT h1.b AS bucket,
       |  CAST(h1.n1 AS BIGINT) AS n_orders, CAST(h2.n2 AS BIGINT) AS n_cust,
       |  CAST(h1.n1 * h2.n2 // greatest(h1.d1, h2.d2) AS BIGINT) AS est_join,
       |  CAST(COALESCE(act.actual, 0) AS BIGINT) AS actual_join
       |FROM h1 JOIN h2 ON h1.b = h2.b
       |LEFT JOIN act ON act.b = h1.b
       |ORDER BY bucket""".stripMargin) { (s, dir) =>
    val customer = Tables.load(s, dir, "customer")
    val orders = Tables.load(s, dir, "orders")
    val bw = math.max(
      customer.agg(max(col("c_custkey")).cast("long")).head().getLong(0)
        / HistBuckets, 1L)
    val h1 = orders
      .filter(col("o_custkey").isNotNull && col("o_custkey") >= 0)
      .groupBy(expr(s"o_custkey div $bw").as("b"))
      .agg(count(lit(1)).as("n1"), countDistinct("o_custkey").as("d1"))
    val h2 = customer
      .filter(col("c_custkey").isNotNull && col("c_custkey") >= 0)
      .groupBy(expr(s"c_custkey div $bw").as("b"))
      .agg(count(lit(1)).as("n2"), countDistinct("c_custkey").as("d2"))
    val act = orders.filter(col("o_custkey") >= 0)
      .join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy(expr(s"o_custkey div $bw").as("b"))
      .agg(count(lit(1)).as("actual"))
    h1.join(h2, "b").join(act, Seq("b"), "left")
      .select(col("b").as("bucket"),
        col("n1").as("n_orders"), col("n2").as("n_cust"),
        expr("n1 * n2 div greatest(d1, d2)").as("est_join"),
        coalesce(col("actual"), lit(0L)).as("actual_join"))
      .orderBy("bucket")
  }

  // ------------- q322: log-bucket quantile sketch

  /** Bucket id of a positive cents value: bit length bl (= floor(log2)+1,
    * via the binary string — identical in both engines) times 32, plus
    * the top-5-bit mantissa. Values below 32 are their own bucket
    * (shift 0), so small buckets are exact. */
  private val BucketSql =
    """length(bin(cents)) * 32
      | + (cents >> greatest(length(bin(cents)) - 5, 0))""".stripMargin
      .replace("\n", "")

  // log-bucket quantile sketch (DDSketch-style, base-2 with 16
  // sub-buckets per octave): bucket ids are pure integer arithmetic
  // (bit length + top mantissa bits), the sketch is a tiny mergeable
  // (group, bucket)→count table, and quantiles come from cumulative
  // bucket counts — relative-error-bounded percentiles with O(#buckets)
  // state where exact percentiles need a full sort;
  /** Spark spells integer shift/div the same way except `>>` → shiftright
    * and `//` → div; quantile ranks use ceil((q·n)/100) in exact integer
    * form on both sides. */
  private val q322 = Q(
    "q322_logbucket_quantile_sketch",
    s"""WITH v AS (
       |  SELECT l_returnflag AS flag,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
       |      AS cents
       |  FROM lineitem
       |  WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL),
       |vp AS (SELECT flag, cents FROM v WHERE cents > 0),
       |sk AS (
       |  SELECT flag, $BucketSql AS bucket, count(*) AS cnt
       |  FROM vp GROUP BY 1, 2),
       |tot AS (SELECT flag, sum(cnt) AS n FROM sk GROUP BY 1),
       |cum AS (
       |  SELECT flag, bucket,
       |    sum(cnt) OVER (PARTITION BY flag ORDER BY bucket) AS cum
       |  FROM sk),
       |qs AS (SELECT unnest([50, 90, 99]) AS q),
       |kth AS (
       |  SELECT t.flag, qs.q, t.n, (qs.q * t.n + 99) // 100 AS k
       |  FROM tot t CROSS JOIN qs),
       |est AS (
       |  SELECT k.flag, k.q, k.n, k.k, min(c.bucket) AS bucket
       |  FROM kth k JOIN cum c ON c.flag = k.flag AND c.cum >= k.k
       |  GROUP BY 1, 2, 3, 4),
       |bounds AS (
       |  SELECT flag, q, n, k, bucket,
       |    (bucket % 32) << greatest(bucket // 32 - 5, 0) AS b_lo,
       |    ((bucket % 32 + 1) << greatest(bucket // 32 - 5, 0)) - 1 AS b_hi
       |  FROM est),
       |ex AS (
       |  SELECT flag, cents,
       |    row_number() OVER (PARTITION BY flag ORDER BY cents) AS rn
       |  FROM vp)
       |SELECT b.flag AS l_returnflag, CAST(b.q AS BIGINT) AS q,
       |  CAST(b.n AS BIGINT) AS n, CAST(b.b_lo AS BIGINT) AS b_lo,
       |  CAST(b.b_hi AS BIGINT) AS b_hi,
       |  CAST(e.cents AS BIGINT) AS exact_cents,
       |  e.cents BETWEEN b.b_lo AND b.b_hi AS contained
       |FROM bounds b JOIN ex e ON e.flag = b.flag AND e.rn = b.k
       |ORDER BY l_returnflag, q""".stripMargin) { (s, dir) =>
    import s.implicits._
    val vp = Tables.load(s, dir, "lineitem")
      .filter(col("l_returnflag").isNotNull &&
        col("l_extendedprice").isNotNull)
      .select(col("l_returnflag").as("flag"),
        (col("l_extendedprice").cast(DecimalType(12, 2)) * 100)
          .cast("long").as("cents"))
      .filter(col("cents") > 0)
    // The sketch: one partial-aggregated shuffle to a (flag, bucket)
    // table whose size is bounded by #flags × #buckets (~64/octave),
    // independent of row count — this is the whole scale story.
    val sk = vp
      .withColumn("bucket", expr(
        "length(bin(cents)) * 32" +
          " + shiftright(cents, greatest(length(bin(cents)) - 5, 0))"))
      .groupBy("flag", "bucket").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val tot = sk.groupBy("flag").agg(sum("cnt").as("n"))
    val cum = sk.select(col("flag"), col("bucket"),
      sum("cnt").over(org.apache.spark.sql.expressions.Window
        .partitionBy("flag").orderBy("bucket")).as("cum"))
    val kth = tot.crossJoin(Seq(50, 90, 99).toDF("q"))
      .withColumn("k", expr("(q * n + 99) div 100"))
    val est = kth.as("k")
      .join(cum.as("c"),
        col("c.flag") === col("k.flag") && col("c.cum") >= col("k.k"))
      .groupBy(col("k.flag").as("flag"), col("k.q").as("q"),
        col("k.n").as("n"), col("k.k").as("k"))
      .agg(min("c.bucket").as("bucket"))
    val bounds = est
      .withColumn("b_lo",
        expr("shiftleft(bucket % 32, greatest(bucket div 32 - 5, 0))"))
      .withColumn("b_hi", expr(
        "shiftleft(bucket % 32 + 1, greatest(bucket div 32 - 5, 0)) - 1"))
    // Exact verification branch (full per-flag sort — the cost the
    // sketch exists to avoid; kept here to PIN the error bound).
    val ex = vp.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("flag").orderBy("cents")))
    bounds.as("b")
      .join(ex.as("e"),
        col("e.flag") === col("b.flag") && col("e.rn") === col("b.k"))
      .select(col("b.flag").as("l_returnflag"),
        col("b.q").cast("long").as("q"), col("b.n").cast("long").as("n"),
        col("b.b_lo").cast("long").as("b_lo"),
        col("b.b_hi").cast("long").as("b_hi"),
        col("e.cents").cast("long").as("exact_cents"),
        col("e.cents").between(col("b.b_lo"), col("b.b_hi"))
          .as("contained"))
      .orderBy("l_returnflag", "q")
  }

  // bitmap-index set operations: per-segment user bitmaps
  // (32-bit words packed into BIGINTs, `bit_or` aggregated) give
  // intersection / union / Jaccard between audience sets from
  // word-aligned `bit_count` sums — the roaring-bitmap pattern where
  // set ops cost O(words), not O(members), and the bitmap build is
  // one partial-aggregated shuffle with no pre-dedup;
  // ------------- q325: bitmap-index set operations

  /** Word-packed bitmaps over non-negative user ids (the bitmap
    * domain; negative ids would need an offset pass — documented
    * contract, filtered identically on both sides). */
  private val q325 = Q(
    "q325_bitmap_set_ops",
    """WITH e AS (
      |  SELECT event_type AS t, user_id AS uid FROM events
      |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
      |    AND user_id >= 0),
      |bm AS (
      |  SELECT t, uid // 32 AS word,
      |    bit_or(CAST(1 AS BIGINT) << CAST(uid % 32 AS INT)) AS mask
      |  FROM e GROUP BY 1, 2),
      |tot AS (SELECT t, sum(bit_count(mask)) AS n FROM bm GROUP BY 1),
      |ovl AS (
      |  SELECT a.t AS t1, b.t AS t2,
      |    sum(bit_count(a.mask & b.mask)) AS n_and
      |  FROM bm a JOIN bm b ON a.word = b.word AND a.t < b.t
      |  GROUP BY 1, 2)
      |SELECT p1.t AS t1, p2.t AS t2,
      |  CAST(p1.n AS BIGINT) AS n1, CAST(p2.n AS BIGINT) AS n2,
      |  CAST(coalesce(o.n_and, 0) AS BIGINT) AS n_and,
      |  CAST(p1.n + p2.n - coalesce(o.n_and, 0) AS BIGINT) AS n_or,
      |  CAST(coalesce(o.n_and, 0) * 100
      |    // (p1.n + p2.n - coalesce(o.n_and, 0)) AS BIGINT) AS jacc_pct
      |FROM tot p1 JOIN tot p2 ON p1.t < p2.t
      |LEFT JOIN ovl o ON o.t1 = p1.t AND o.t2 = p2.t
      |ORDER BY t1, t2""".stripMargin) { (s, dir) =>
    val e = Tables.load(s, dir, "events")
      .filter(col("event_type").isNotNull && col("user_id").isNotNull &&
        col("user_id") >= 0)
      .select(col("event_type").as("t"), col("user_id").as("uid"))
    // bit_or absorbs duplicate (user, type) rows — no distinct pass.
    val bm = e
      .select(col("t"), expr("uid div 32").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(uid % 32 AS INT))")
          .as("m"))
      .groupBy("t", "word").agg(expr("bit_or(m)").as("mask"))
      .localCheckpoint() // bitmap segments reused by totals + overlaps
    val tot = bm.groupBy("t").agg(sum(expr("bit_count(mask)")).as("n"))
    val ovl = bm.as("a")
      .join(bm.as("b"),
        col("a.word") === col("b.word") && col("a.t") < col("b.t"))
      .groupBy(col("a.t").as("t1"), col("b.t").as("t2"))
      .agg(sum(expr("bit_count(a.mask & b.mask)")).as("n_and"))
    tot.as("p1").join(tot.as("p2"), col("p1.t") < col("p2.t"))
      .join(ovl,
        ovl("t1") === col("p1.t") && ovl("t2") === col("p2.t"), "left")
      .select(col("p1.t").as("t1"), col("p2.t").as("t2"),
        col("p1.n").cast("long").as("n1"),
        col("p2.n").cast("long").as("n2"),
        coalesce(col("n_and"), lit(0L)).cast("long").as("n_and"))
      .withColumn("n_or", col("n1") + col("n2") - col("n_and"))
      .withColumn("jacc_pct", expr("n_and * 100 div n_or"))
      .orderBy("t1", "t2")
  }

  // (q345 reuses q92's CMS constants and bucketSql above)

  /** join-size estimation via Count-Min inner products: the AMS
    * idea on CM sketches — |A ⋈ B| is estimated by min over hash rows
    * of Σ_w cmsA[w]·cmsB[w], never an over- into under-estimate
    * (E[est] ≥ truth, exact when no cross-key collisions) — the
    * sketch-only planning statistic next to q318's histograms and
    * q319's catalog stats, reusing q92's cross-engine CMS aggregate;
    */
  // ------------- q345: CM-sketch join-size estimate

  private val q345 = Q(
    "q345_cms_join_size_estimate",
    { // oracle: per hash row, bucket-count both sides directly and
      // inner-product them; truth from the exact per-key join counts
      val rowsA = (0 until Depth).map { i =>
        s"""SELECT $i AS i, ${bucketSql(i, "l_partkey")} AS bkt,
           |  count(*) AS c
           |FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1, 2"""
          .stripMargin
      }.mkString("\nUNION ALL\n")
      val rowsB = (0 until Depth).map { i =>
        s"""SELECT $i AS i, ${bucketSql(i, "p_partkey")} AS bkt,
           |  count(*) AS c
           |FROM part WHERE p_partkey IS NOT NULL GROUP BY 1, 2"""
          .stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH ca AS ($rowsA), cb AS ($rowsB),
         |ip AS (
         |  SELECT ca.i, sum(ca.c * cb.c) AS est
         |  FROM ca JOIN cb ON ca.i = cb.i AND ca.bkt = cb.bkt
         |  GROUP BY 1),
         |est AS (SELECT min(est) AS est_n FROM ip),
         |tru AS (
         |  SELECT count(*) AS true_n
         |  FROM lineitem JOIN part ON l_partkey = p_partkey)
         |SELECT CAST(tru.true_n AS BIGINT) AS true_n,
         |  CAST(est.est_n AS BIGINT) AS est_n,
         |  CAST((est.est_n - tru.true_n) * 10000 // tru.true_n AS BIGINT)
         |    AS overest_bp
         |FROM tru CROSS JOIN est""".stripMargin
    }) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms",
      exprs => graft.functions.CountMinSketchAgg(
        exprs.head, Depth, Width, cmsA, cmsB, P).toAggregateExpression(),
      "scala_udf")
    // one sketch per side (two tiny 1-row aggregates), inner products
    // via an array-fold — the estimate never touches the join itself
    val ips = (0 until Depth).map { i =>
      s"""aggregate(sequence(0, ${Width - 1}), 0L,
         |  (acc, w) -> acc + ca[w + ${i * Width}] * cb[w + ${i * Width}])"""
        .stripMargin.replace("\n", " ")
    }.mkString("LEAST(", ", ", ")")
    s.sql(
      s"""WITH sa AS (SELECT graft_cms(l_partkey) AS ca FROM lineitem
         |  WHERE l_partkey IS NOT NULL),
         |sb AS (SELECT graft_cms(p_partkey) AS cb FROM part
         |  WHERE p_partkey IS NOT NULL),
         |est AS (SELECT CAST($ips AS BIGINT) AS est_n
         |  FROM sa CROSS JOIN sb),
         |tru AS (SELECT count(*) AS true_n
         |  FROM lineitem JOIN part ON l_partkey = p_partkey)
         |SELECT CAST(tru.true_n AS BIGINT) AS true_n,
         |  CAST(est.est_n AS BIGINT) AS est_n,
         |  CAST((est.est_n - tru.true_n) * 10000 div tru.true_n AS BIGINT)
         |    AS overest_bp
         |FROM tru CROSS JOIN est""".stripMargin)
  }

  // ------------- q361: equi-depth histogram

  private val Buckets = 16

  /** equi-depth histogram: 16 buckets of ~n/B rows each via
    * ntile in the (cents, key) total order — per bucket n/lo/hi/ndv,
    * the CBO selectivity statistic (q318's fixed-WIDTH histogram is
    * the other family). The global order comes from ScalableRank-style
    * range partitioning, not a single-partition window.
    */
  private val q361 = Q(
    "q361_equidepth_histogram",
    s"""WITH v AS (
       |  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
       |    AS cents, o_orderkey AS k
       |  FROM orders
       |  WHERE o_totalprice IS NOT NULL AND o_orderkey IS NOT NULL),
       |b AS (
       |  SELECT cents, ntile($Buckets) OVER (ORDER BY cents, k) AS bucket
       |  FROM v)
       |SELECT CAST(bucket AS BIGINT) AS bucket,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(min(cents) AS BIGINT) AS lo,
       |  CAST(max(cents) AS BIGINT) AS hi,
       |  CAST(count(DISTINCT cents) AS BIGINT) AS ndv
       |FROM b GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val v = Tables.load(s, dir, "orders")
      .filter(col("o_totalprice").isNotNull && col("o_orderkey").isNotNull)
      .select((col("o_totalprice").cast(DecimalType(12, 2)) * 100)
        .cast("long").as("cents"), col("o_orderkey").as("k"))
    // global rank without a single-partition window, then the exact
    // ntile allocation: first (n mod B) buckets get ceil(n/B) rows
    val ranked = ScalableRank.withRank(v, "rk", col("cents"), col("k"))
    val n = ranked.count()
    val (q, rem) = (n / Buckets, n % Buckets)
    val bucketExpr = when(col("rk") <= (q + 1) * rem,
      ((col("rk") - 1) / (q + 1)).cast("long") + 1)
      .otherwise(lit(rem) + ((col("rk") - 1 - (q + 1) * rem) / q)
        .cast("long") + 1)
    ranked
      .withColumn("bucket", bucketExpr)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("cents").as("lo"),
        max("cents").as("hi"), countDistinct("cents").as("ndv"))
      .select(col("bucket").cast("long").as("bucket"),
        col("n").cast("long").as("n"), col("lo").cast("long").as("lo"),
        col("hi").cast("long").as("hi"),
        col("ndv").cast("long").as("ndv"))
      .orderBy("bucket")
  }
  val defs: Seq[Q] = Seq(q281, q284, q294, q306, q318, q322, q325, q345, q361, q92, q93, q178)
}
