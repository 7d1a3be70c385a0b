package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-9 surfaces, part 15 — link analysis, distributional audits,
  * and leakage-free feature generation:
  *
  *  - q331 HITS hubs & authorities over the user↔event-type bipartite
  *    graph: fixed-iteration power method with INTEGER max-normalization
  *    (scores rescaled to 0..10000 by integer division each half-step),
  *    so both engines iterate bit-identically — the mutual-reinforcement
  *    ranking PageRank (q192) doesn't express;
  *  - q332 Benford first-digit audit: observed leading-digit mass vs
  *    the Benford expectation log10(1+1/d), the expectation embedded as
  *    integer micro-literals (no runtime log), deviations in basis
  *    points — the classic fabricated-data screen over monetary columns;
  *  - q333 feature-store point-in-time join: every purchase example is
  *    joined to features computed ONLY from events strictly before it
  *    within a 7-day staleness horizon, via value-based window frames
  *    `RANGE BETWEEN 7d PRECEDING AND 1 PRECEDING` on the microsecond
  *    axis — the leakage-free feature backfill a training pipeline
  *    needs (same-timestamp co-events are excluded by value, so row
  *    order can never leak the label).
  */
object ModernOps15 {

  // ------------- q331: HITS hubs & authorities

  private val HitsIters = 3
  private val HitsScale = 10000L

  /** One normalized half-step in SQL: raw sums then integer rescale by
    * the max. */
  private def duckHalf(
      out: String, in: String, from: String, to: String): String =
    s"""${out}r AS (
       |  SELECT e.$to AS k, sum($in.s) AS raw
       |  FROM e JOIN $in ON $in.k = e.$from GROUP BY 1),
       |$out AS (
       |  SELECT k, raw * $HitsScale // (SELECT max(raw) FROM ${out}r) AS s
       |  FROM ${out}r)""".stripMargin

  private val q331 = Q(
    "q331_hits_hubs_authorities",
    s"""WITH e AS (
       |  SELECT DISTINCT user_id AS u, event_type AS t FROM events
       |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
       |h0 AS (SELECT u AS k, $HitsScale AS s FROM (SELECT DISTINCT u FROM e)),
       |${duckHalf("a1", "h0", "u", "t")},
       |${duckHalf("h1", "a1", "t", "u")},
       |${duckHalf("a2", "h1", "u", "t")},
       |${duckHalf("h2", "a2", "t", "u")},
       |${duckHalf("a3", "h2", "u", "t")},
       |${duckHalf("h3", "a3", "t", "u")},
       |hubs AS (
       |  SELECT 'hub_band' AS kind, CAST(s // 1000 AS VARCHAR) AS key,
       |    CAST(count(*) AS BIGINT) AS score
       |  FROM h3 GROUP BY 2),
       |auths AS (
       |  SELECT 'authority' AS kind, k AS key, CAST(s AS BIGINT) AS score
       |  FROM a3)
       |SELECT * FROM auths UNION ALL SELECT * FROM hubs
       |ORDER BY kind, key""".stripMargin) { (s, dir) =>
    val e = Tables.load(s, dir, "events")
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
      .select(col("user_id").as("u"), col("event_type").as("t"))
      .distinct()
      .localCheckpoint() // the edge list is reused 6x
    def half(in: DataFrame, from: String, to: String): DataFrame = {
      val raw = e.join(in, in("k") === e(from))
        .groupBy(e(to).as("k")).agg(sum("s").as("raw"))
      val mx = raw.agg(max("raw").as("mx"))
      raw.crossJoin(broadcast(mx))
        .select(col("k"), expr(s"raw * $HitsScale div mx").as("s"))
    }
    var h: DataFrame = e.select("u").distinct()
      .select(col("u").as("k"), lit(HitsScale).as("s"))
    var a: DataFrame = null
    for (_ <- 1 to HitsIters) {
      a = half(h, "u", "t")
      h = half(a, "t", "u")
    }
    val auths = a.select(lit("authority").as("kind"),
      col("k").as("key"), col("s").cast("long").as("score"))
    val hubs = h.select(expr("s div 1000").as("band"))
      .groupBy("band")
      .agg(count(lit(1)).as("score"))
      .select(lit("hub_band").as("kind"), col("band").cast("string")
        .as("key"), col("score").cast("long").as("score"))
    auths.unionByName(hubs).orderBy("kind", "key")
  }

  // ------------- q332: Benford first-digit audit

  /** round(1e6 · log10(1+1/d)) for d = 1..9 — compile-time literals so
    * neither engine touches libm. */
  private val BenfordMicro = Seq(301030L, 176091L, 124939L, 96910L,
    79181L, 66947L, 57992L, 51153L, 45757L)

  private val q332 = Q(
    "q332_benford_audit",
    s"""WITH v AS (
       |  SELECT l_returnflag AS flag,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
       |      AS cents
       |  FROM lineitem
       |  WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL),
       |dg AS (
       |  SELECT flag,
       |    CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS d
       |  FROM v WHERE cents > 0),
       |obs AS (SELECT flag, d, count(*) AS n FROM dg GROUP BY 1, 2),
       |tot AS (SELECT flag, sum(n) AS nt FROM obs GROUP BY 1),
       |bf(d, micro) AS (VALUES ${BenfordMicro.zipWithIndex
            .map { case (m, i) => s"(${i + 1}, ${m})" }.mkString(", ")})
       |SELECT t.flag AS l_returnflag, CAST(bf.d AS BIGINT) AS d,
       |  CAST(coalesce(o.n, 0) AS BIGINT) AS n_obs,
       |  CAST(t.nt * bf.micro AS BIGINT) AS exp_micro,
       |  CAST(coalesce(o.n, 0) * 1000000 AS BIGINT) AS obs_micro,
       |  CAST(abs(coalesce(o.n, 0) * 1000000 - t.nt * bf.micro) * 10000
       |    // (t.nt * bf.micro) AS BIGINT) AS dev_bp
       |FROM tot t CROSS JOIN bf
       |LEFT JOIN obs o ON o.flag = t.flag AND o.d = bf.d
       |ORDER BY l_returnflag, d""".stripMargin) { (s, dir) =>
    import s.implicits._
    val v = Tables.load(s, dir, "lineitem")
      .filter(col("l_returnflag").isNotNull &&
        col("l_extendedprice").isNotNull)
      .select(col("l_returnflag").as("flag"),
        (col("l_extendedprice").cast(DecimalType(12, 2)) * 100)
          .cast("long").as("cents"))
      .filter(col("cents") > 0)
    val obs = v
      .select(col("flag"),
        substring(col("cents").cast("string"), 1, 1).cast("long").as("d"))
      .groupBy("flag", "d").agg(count(lit(1)).as("n"))
    val tot = obs.groupBy("flag").agg(sum("n").as("nt"))
    val bf = BenfordMicro.zipWithIndex
      .map { case (m, i) => ((i + 1).toLong, m) }.toDF("d", "micro")
    tot.crossJoin(broadcast(bf))
      .join(obs, Seq("flag", "d"), "left")
      .select(col("flag").as("l_returnflag"), col("d"),
        coalesce(col("n"), lit(0L)).cast("long").as("n_obs"),
        (col("nt") * col("micro")).cast("long").as("exp_micro"),
        (coalesce(col("n"), lit(0L)) * 1000000L).cast("long")
          .as("obs_micro"),
        expr("abs(coalesce(n, 0) * 1000000 - nt * micro) * 10000" +
          " div (nt * micro)").cast("long").as("dev_bp"))
      .orderBy("l_returnflag", "d")
  }

  // ------------- q333: feature-store point-in-time join

  private val PitHorizonUs = 7L * 24 * 3600 * 1000000 // 7 days

  private val q333 = Q(
    "q333_pit_feature_join",
    s"""WITH e AS (
       |  SELECT event_id, user_id, event_type,
       |    epoch_us(ts) AS us,
       |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
       |  FROM events
       |  WHERE event_id IS NOT NULL AND user_id IS NOT NULL
       |    AND ts IS NOT NULL AND event_type IS NOT NULL),
       |f AS (
       |  SELECT event_id, user_id, event_type, us,
       |    count(CASE WHEN event_type = 'view' THEN 1 END)
       |      OVER pit AS n_views_7d,
       |    coalesce(sum(CASE WHEN event_type = 'click' THEN cents END)
       |      OVER pit, 0) AS click_cents_7d,
       |    max(CASE WHEN event_type = 'view' THEN us END)
       |      OVER pit AS last_view_us
       |  FROM e
       |  WINDOW pit AS (PARTITION BY user_id ORDER BY us
       |    RANGE BETWEEN $PitHorizonUs PRECEDING AND 1 PRECEDING))
       |SELECT event_id, user_id, CAST(us AS BIGINT) AS us,
       |  CAST(n_views_7d AS BIGINT) AS n_views_7d,
       |  CAST(click_cents_7d AS BIGINT) AS click_cents_7d,
       |  CAST(coalesce(last_view_us, -1) AS BIGINT) AS last_view_us,
       |  CAST(CASE WHEN last_view_us IS NULL THEN -1
       |    ELSE us - last_view_us END AS BIGINT) AS staleness_us
       |FROM f WHERE event_type = 'purchase'
       |ORDER BY event_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val e = Tables.load(s, dir, "events")
      .filter(col("event_id").isNotNull && col("user_id").isNotNull &&
        col("ts").isNotNull && col("event_type").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"),
        (col("value").cast(DecimalType(12, 2)) * 100).cast("long")
          .as("cents"))
    // Strictly-before-by-VALUE frame: same-microsecond co-events are
    // outside [us-7d, us-1], so the label row can never feed its own
    // features regardless of tie order.
    val pit = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(-PitHorizonUs, -1)
    e.withColumn("n_views_7d",
        count(when(col("event_type") === "view", 1)).over(pit))
      .withColumn("click_cents_7d",
        coalesce(sum(when(col("event_type") === "click", col("cents")))
          .over(pit), lit(0L)))
      .withColumn("last_view_us",
        max(when(col("event_type") === "view", col("us"))).over(pit))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        col("us").cast("long").as("us"),
        col("n_views_7d").cast("long").as("n_views_7d"),
        col("click_cents_7d").cast("long").as("click_cents_7d"),
        coalesce(col("last_view_us"), lit(-1L)).cast("long")
          .as("last_view_us"),
        when(col("last_view_us").isNull, -1L)
          .otherwise(col("us") - col("last_view_us")).cast("long")
          .as("staleness_us"))
      .orderBy("event_id")
  }

  val defs: Seq[Q] = Seq(q331, q332, q333)
}
