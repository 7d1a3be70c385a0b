package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-9 surfaces, part 26 — error-channel arithmetic, retention
  * enforcement, and RFM segmentation:
  *
  *  - q362 `try_*` semantics pin: `try_add` BIGINT overflow,
  *    `try_divide` by zero, `try_to_number` on malformed strings —
  *    each takes the NULL channel in Spark exactly where the DuckDB
  *    oracle's explicit would-fail CASE predicate says it must
  *    (positivity / zero-divisor / poisoned-or-signed input). Pins the
  *    error-channel contract a pipeline relies on when it must never
  *    abort on a poison row;
  *  - q363 TTL retention sweep: a per-event-type retention policy
  *    (broadcast, derived deterministically) applied against the
  *    corpus horizon — per type the kept/purged counts, the cutoff,
  *    and purged value mass in cents. The GDPR/retention pre-flight:
  *    counts only, one linear pass, policy joined map-side;
  *  - q364 RFM segmentation: per user Recency (days since last
  *    purchase), Frequency (purchase count), Monetary (exact cents),
  *    each scored 1–5 by the exact ntile quintile allocation in a
  *    deterministic total order, rolled up to segment populations —
  *    the classic marketing matrix; user aggregation is one linear
  *    shuffle, the quintile windows run over ≤ #users rows.
  */
object ModernOps26 {

  // ------------- q362: try_* error-channel semantics

  private val q362 = Q(
    "q362_try_arithmetic",
    """WITH e AS (
      |  SELECT
      |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
      |    user_id
      |  FROM events
      |  WHERE event_id IS NOT NULL AND value IS NOT NULL
      |    AND user_id IS NOT NULL AND event_type IS NOT NULL),
      |t AS (
      |  SELECT
      |    -- try_add(cents, MaxLong): overflows exactly when cents > 0
      |    CASE WHEN cents > 0 THEN NULL ELSE cents END AS add_residual,
      |    -- try_divide(cents, user_id % 7): NULL exactly at divisor 0
      |    CASE WHEN user_id % 7 = 0 THEN NULL ELSE cents END AS div_kept,
      |    -- try_to_number: poisoned prefix or a sign digit the format
      |    -- lacks -> NULL channel; clean non-negative integers parse
      |    CASE WHEN user_id % 3 <> 0 AND cents >= 0 THEN cents
      |         ELSE NULL END AS num_val
      |  FROM e)
      |SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN add_residual IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_add_overflow,
      |  CAST(sum(coalesce(add_residual, 0)) AS BIGINT) AS add_residual,
      |  CAST(sum(CASE WHEN div_kept IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_div_null,
      |  CAST(sum(coalesce(div_kept, 0)) AS BIGINT) AS div_kept_cents,
      |  CAST(sum(CASE WHEN num_val IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_num_null,
      |  CAST(sum(coalesce(num_val, 0)) AS BIGINT) AS num_sum
      |FROM t""".stripMargin) { (s, dir) =>
    val e = Tables.load(s, dir, "events")
      .filter(col("event_id").isNotNull && col("value").isNotNull &&
        col("user_id").isNotNull && col("event_type").isNotNull)
      .select(
        (col("value").cast(DecimalType(12, 2)) * 100).cast("long")
          .as("cents"),
        col("user_id"),
        // poison every 3rd user's string; negatives lack a sign slot in
        // the to_number format, so they too must take the NULL channel
        when(col("user_id") % 3 === 0,
          concat(lit("x"), col("value").cast(DecimalType(12, 2)) * 100))
          .otherwise(((col("value").cast(DecimalType(12, 2)) * 100)
            .cast("long")).cast("string")).as("numish"))
    val t = e.select(
      // the add value channel is MaxLong + cents: subtract the constant
      // back so the SUM stays in range (summing ~9e18 values would
      // itself overflow — silently in non-ANSI Spark, loudly in DuckDB)
      (expr("try_add(cents, 9223372036854775807L)")
        - lit(Long.MaxValue)).as("add_residual"),
      when(expr("try_divide(cents, user_id % 7)").isNotNull, col("cents"))
        .as("div_kept"),
      expr("try_to_number(numish, '999999999999999999')").cast("long")
        .as("num_val"))
    t.agg(count(lit(1)).as("n"),
      sum(when(col("add_residual").isNull, 1L).otherwise(0L))
        .as("n_add_overflow"),
      sum(coalesce(col("add_residual"), lit(0L))).as("add_residual"),
      sum(when(col("div_kept").isNull, 1L).otherwise(0L)).as("n_div_null"),
      sum(coalesce(col("div_kept"), lit(0L))).as("div_kept_cents"),
      sum(when(col("num_val").isNull, 1L).otherwise(0L)).as("n_num_null"),
      sum(coalesce(col("num_val"), lit(0L))).as("num_sum"))
      .select(col("n").cast("long").as("n"),
        col("n_add_overflow").cast("long").as("n_add_overflow"),
        col("add_residual").cast("long").as("add_residual"),
        col("n_div_null").cast("long").as("n_div_null"),
        col("div_kept_cents").cast("long").as("div_kept_cents"),
        col("n_num_null").cast("long").as("n_num_null"),
        col("num_sum").cast("long").as("num_sum"))
  }

  // ------------- q363: TTL retention sweep

  private val q363 = Q(
    "q363_ttl_retention",
    """WITH horizon AS (
      |  SELECT max(ts) AS mx FROM events WHERE ts IS NOT NULL),
      |policy AS (
      |  SELECT 'view' AS event_type, 7 AS ttl_days
      |  UNION ALL SELECT 'click', 14
      |  UNION ALL SELECT 'purchase', 365
      |  UNION ALL SELECT 'signup', 365
      |  UNION ALL SELECT 'error', 3),
      |e AS (
      |  SELECT event_type, ts,
      |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL)
      |SELECT e.event_type, CAST(p.ttl_days AS BIGINT) AS ttl_days,
      |  CAST(sum(CASE WHEN e.ts >= h.mx - to_days(p.ttl_days)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS kept,
      |  CAST(sum(CASE WHEN e.ts < h.mx - to_days(p.ttl_days)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS purged,
      |  CAST(sum(CASE WHEN e.ts < h.mx - to_days(p.ttl_days)
      |    THEN coalesce(e.cents, 0) ELSE 0 END) AS BIGINT)
      |    AS purged_cents
      |FROM e JOIN policy p ON p.event_type = e.event_type
      |CROSS JOIN horizon h
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val e = Tables.load(s, dir, "events")
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"), col("ts"),
        (col("value").cast(DecimalType(12, 2)) * 100).cast("long")
          .as("cents"))
    val policy = Seq(("view", 7), ("click", 14), ("purchase", 365),
      ("signup", 365), ("error", 3)).toDF("event_type", "ttl_days")
    val horizon = e.agg(max("ts").as("mx"))
    e.join(broadcast(policy), "event_type")
      .crossJoin(broadcast(horizon))
      .withColumn("cut",
        col("mx") - expr("make_interval(0, 0, 0, ttl_days, 0, 0, 0)"))
      .groupBy(col("event_type"), col("ttl_days").cast("long")
        .as("ttl_days"))
      .agg(
        sum(when(col("ts") >= col("cut"), 1L).otherwise(0L)).as("kept"),
        sum(when(col("ts") < col("cut"), 1L).otherwise(0L)).as("purged"),
        sum(when(col("ts") < col("cut"), coalesce(col("cents"), lit(0L)))
          .otherwise(0L)).as("purged_cents"))
      .select(col("event_type"), col("ttl_days"),
        col("kept").cast("long").as("kept"),
        col("purged").cast("long").as("purged"),
        col("purged_cents").cast("long").as("purged_cents"))
      .orderBy("event_type")
  }

  // ------------- q364: RFM segmentation

  private val q364 = Q(
    "q364_rfm_segments",
    """WITH p AS (
      |  SELECT user_id,
      |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
      |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |  FROM events
      |  WHERE event_type = 'purchase' AND user_id IS NOT NULL
      |    AND ts IS NOT NULL AND value IS NOT NULL),
      |horizon AS (SELECT max(d) AS mx FROM p),
      |u AS (
      |  SELECT user_id, (SELECT mx FROM horizon) - max(d) AS recency,
      |    count(*) AS freq, sum(cents) AS monetary
      |  FROM p GROUP BY 1),
      |scored AS (
      |  SELECT user_id,
      |    6 - ntile(5) OVER (ORDER BY recency, user_id) AS r,
      |    ntile(5) OVER (ORDER BY freq, user_id) AS f,
      |    ntile(5) OVER (ORDER BY monetary, user_id) AS m
      |  FROM u)
      |SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
      |  CAST(m AS BIGINT) AS m, CAST(count(*) AS BIGINT) AS n_users
      |FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) {
    (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val p = Tables.load(s, dir, "events")
      .filter(col("event_type") === "purchase" &&
        col("user_id").isNotNull && col("ts").isNotNull &&
        col("value").isNotNull)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long")
          .as("d"),
        (col("value").cast(DecimalType(12, 2)) * 100).cast("long")
          .as("cents"))
    val horizon = p.agg(max("d").as("mx"))
    val u = p.groupBy("user_id")
      .agg(max("d").as("last_d"), count(lit(1)).as("freq"),
        sum("cents").as("monetary"))
      .crossJoin(broadcast(horizon))
      .select(col("user_id"), (col("mx") - col("last_d")).as("recency"),
        col("freq"), col("monetary"))
    // ≤ #users rows: the quintile windows are post-aggregation
    u.select(col("user_id"),
      (lit(6) - ntile(5).over(Window.orderBy("recency", "user_id")))
        .as("r"),
      ntile(5).over(Window.orderBy("freq", "user_id")).as("f"),
      ntile(5).over(Window.orderBy("monetary", "user_id")).as("m"))
      .groupBy("r", "f", "m")
      .agg(count(lit(1)).as("n_users"))
      .select(col("r").cast("long").as("r"),
        col("f").cast("long").as("f"), col("m").cast("long").as("m"),
        col("n_users").cast("long").as("n_users"))
      .orderBy("r", "f", "m")
  }

  val defs: Seq[Q] = Seq(q362, q363, q364)
}
