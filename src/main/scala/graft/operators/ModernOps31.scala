package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 surfaces, part 31 — arrival processes, seasonality, and
  * growth accounting:
  *
  *  - q375 inter-arrival histogram: per event type, the distribution
  *    of same-user consecutive gaps in log2-microsecond buckets —
  *    the arrival-process fingerprint separating bursty from
  *    Poisson-ish behavior. floor(log2(gap)) computes EXACTLY as
  *    length(bin(gap)) − 1 (binary digit count, both engines) — no
  *    floating log anywhere; one lag window per (user, type), then a
  *    counts-only rollup;
  *  - q376 day-of-week seasonality index: per dow the purchase-count
  *    index vs the all-days mean in exact cross-multiplied basis
  *    points (sum_dow·n_days_total·10⁴/(total·n_days_dow)) — the
  *    capacity planner's table; dow from epoch-day arithmetic
  *    ((d + 4) % 7, 1970-01-01 being a Thursday), no locale
  *    functions;
  *  - q377 growth accounting: per day the canonical ledger — new
  *    (first seen), retained (active today and yesterday),
  *    resurrected (active today, absent yesterday, seen before),
  *    churned (active yesterday, absent today) — from one per-(user,
  *    day) activity table lag-joined to itself plus the per-user
  *    first day; actives(d) = new + retained + resurrected holds row
  *    by row. Linear shuffles on (user, day).
  */
object ModernOps31 {

  // ------------- q375: inter-arrival log2 histogram

  private val q375 = Q(
    "q375_interarrival_histogram",
    """WITH e AS (
      |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us
      |  FROM events
      |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
      |    AND event_type IS NOT NULL),
      |gaps AS (
      |  SELECT event_type,
      |    us - lag(us) OVER (PARTITION BY user_id, event_type
      |      ORDER BY us, event_id) AS gap
      |  FROM e)
      |SELECT event_type,
      |  CAST(length(bin(gap)) - 1 AS BIGINT) AS log2_bucket,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM gaps WHERE gap IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val e = Tables.load(s, dir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_type").isNotNull)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy("us", "event_id")
    e.withColumn("gap", col("us") - lag("us", 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy(col("event_type"),
        (length(bin(col("gap"))) - 1).cast("long").as("log2_bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("log2_bucket"),
        col("n").cast("long").as("n"))
      .orderBy("event_type", "log2_bucket")
  }

  // ------------- q376: day-of-week seasonality index

  private val q376 = Q(
    "q376_dow_seasonality",
    """WITH daily AS (
      |  SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
      |    count(*) AS purchases
      |  FROM events
      |  WHERE ts IS NOT NULL AND event_type = 'purchase'
      |  GROUP BY 1),
      |dowed AS (SELECT (d + 4) % 7 AS dow, purchases FROM daily),
      |tot AS (
      |  SELECT count(*) AS n_days, sum(purchases) AS total FROM dowed)
      |SELECT CAST(dow AS BIGINT) AS dow,
      |  CAST(count(*) AS BIGINT) AS n_days,
      |  CAST(sum(purchases) AS BIGINT) AS purchases,
      |  CAST(sum(purchases) * t.n_days * 10000
      |    // (t.total * count(*)) AS BIGINT) AS index_bp
      |FROM dowed CROSS JOIN tot t
      |GROUP BY dow, t.n_days, t.total ORDER BY 1""".stripMargin) { (s, dir) =>
    val daily = Tables.load(s, dir, "events")
      .filter(col("ts").isNotNull && col("event_type") === "purchase")
      .groupBy(datediff(to_date(col("ts")), lit("1970-01-01")).as("d"))
      .agg(count(lit(1)).as("purchases"))
      .select(((col("d") + 4) % 7).as("dow"), col("purchases"))
    val tot = daily.agg(count(lit(1)).as("n_days_total"),
      sum("purchases").as("total"))
    daily.crossJoin(broadcast(tot))
      .groupBy("dow", "n_days_total", "total")
      .agg(count(lit(1)).as("n_days"), sum("purchases").as("purchases"))
      .select(col("dow").cast("long").as("dow"),
        col("n_days").cast("long").as("n_days"),
        col("purchases").cast("long").as("purchases"),
        expr("purchases * n_days_total * 10000 div (total * n_days)")
          .cast("long").as("index_bp"))
      .orderBy("dow")
  }

  // ------------- q377: growth accounting ledger

  private val q377 = Q(
    "q377_growth_accounting",
    """WITH act AS (
      |  SELECT DISTINCT user_id,
      |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
      |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
      |first AS (SELECT user_id, min(d) AS f FROM act GROUP BY 1),
      |today AS (
      |  SELECT a.user_id, a.d, f.f,
      |    CASE WHEN y.user_id IS NOT NULL THEN 1 ELSE 0 END AS was_active
      |  FROM act a JOIN first f ON f.user_id = a.user_id
      |  LEFT JOIN act y ON y.user_id = a.user_id AND y.d = a.d - 1),
      |churn AS (
      |  SELECT a.d + 1 AS d, count(*) AS churned
      |  FROM act a LEFT JOIN act t
      |    ON t.user_id = a.user_id AND t.d = a.d + 1
      |  WHERE t.user_id IS NULL GROUP BY 1),
      |ledger AS (
      |  SELECT d,
      |    sum(CASE WHEN f = d THEN 1 ELSE 0 END) AS new_users,
      |    sum(CASE WHEN f < d AND was_active = 1 THEN 1 ELSE 0 END)
      |      AS retained,
      |    sum(CASE WHEN f < d AND was_active = 0 THEN 1 ELSE 0 END)
      |      AS resurrected,
      |    count(*) AS actives
      |  FROM today GROUP BY 1)
      |SELECT CAST(l.d AS BIGINT) AS d,
      |  CAST(l.actives AS BIGINT) AS actives,
      |  CAST(l.new_users AS BIGINT) AS new_users,
      |  CAST(l.retained AS BIGINT) AS retained,
      |  CAST(l.resurrected AS BIGINT) AS resurrected,
      |  CAST(coalesce(c.churned, 0) AS BIGINT) AS churned
      |FROM ledger l LEFT JOIN churn c ON c.d = l.d
      |ORDER BY 1""".stripMargin) { (s, dir) =>
    val act = Tables.load(s, dir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long")
          .as("d"))
      .distinct()
    val first = act.groupBy("user_id").agg(min("d").as("f"))
    val yesterday = act.select(col("user_id").as("y_user"),
      (col("d") + 1).as("y_d"))
    val today = act.join(first, "user_id")
      .join(yesterday,
        col("user_id") === col("y_user") && col("d") === col("y_d"),
        "left")
      .select(col("d"), col("f"),
        when(col("y_user").isNotNull, 1).otherwise(0).as("was_active"))
    val ledger = today.groupBy("d")
      .agg(sum(when(col("f") === col("d"), 1L).otherwise(0L))
          .as("new_users"),
        sum(when(col("f") < col("d") && col("was_active") === 1, 1L)
          .otherwise(0L)).as("retained"),
        sum(when(col("f") < col("d") && col("was_active") === 0, 1L)
          .otherwise(0L)).as("resurrected"),
        count(lit(1)).as("actives"))
    val tomorrow = act.select(col("user_id").as("t_user"),
      (col("d") - 1).as("t_d"))
    val churn = act.join(tomorrow,
        col("user_id") === col("t_user") && col("d") === col("t_d"),
        "left")
      .filter(col("t_user").isNull)
      .groupBy((col("d") + 1).as("cd"))
      .agg(count(lit(1)).as("churned"))
    ledger.join(churn, col("d") === col("cd"), "left")
      .select(col("d").cast("long").as("d"),
        col("actives").cast("long").as("actives"),
        col("new_users").cast("long").as("new_users"),
        col("retained").cast("long").as("retained"),
        col("resurrected").cast("long").as("resurrected"),
        coalesce(col("churned"), lit(0L)).cast("long").as("churned"))
      .orderBy("d")
  }

  val defs: Seq[Q] = Seq(q375, q376, q377)
}
