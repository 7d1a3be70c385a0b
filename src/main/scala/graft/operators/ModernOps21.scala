package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-9 surfaces, part 21 — survival, co-movement, and bar charts:
  *
  *  - q351 churn life table with right-censoring: per user the
  *    observed lifetime (first→last event hour); users still active in
  *    the final 24 corpus hours are CENSORED, not churned (the classic
  *    Kaplan–Meier input). Per duration: at-risk (reverse cumulative
  *    sum), churned, censored, discrete hazard and Nelson–Aalen-style
  *    cumulative hazard in exact basis points — two linear shuffles
  *    (per-user agg, per-duration agg) + a window over ≤ #days rows;
  *  - q352 cross-correlation matrix of the daily metric series
  *    (purchases / views / clicks / distinct users): exact Pearson
  *    numerators (n·Σxy − Σx·Σy and both variance numerators) for all
  *    six metric pairs from ONE pass of sums over the wide daily
  *    table — q350's lead-lag machinery generalized across series;
  *    integer counts keep every product far inside BIGINT at 100x;
  *  - q353 OHLC bars: per (event_type, hour) the open/high/low/close
  *    of the value series in exact cents, with open/close pinned by
  *    deterministic (ts, event_id) row-number tie-breaks (not a
  *    nondeterministic `first()`), plus row count and exact sum —
  *    the time-series bar aggregation, one shuffle + one window.
  */
object ModernOps21 {

  // ------------- q351: churn life table with right-censoring

  private val CensorHours = 24

  private val q351 = Q(
    "q351_life_table",
    s"""WITH e AS (
       |  SELECT user_id,
       |    datediff('hour', TIMESTAMP '1970-01-01 00:00:00',
       |      date_trunc('hour', ts)) AS d
       |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
       |horizon AS (SELECT max(d) AS mx FROM e),
       |users AS (
       |  SELECT user_id, max(d) - min(d) AS duration,
       |    CASE WHEN max(d) >= (SELECT mx FROM horizon) - ${CensorHours - 1}
       |      THEN 1 ELSE 0 END AS censored
       |  FROM e GROUP BY 1),
       |lt AS (
       |  SELECT duration,
       |    sum(1 - censored) AS churned, sum(censored) AS censored
       |  FROM users GROUP BY 1),
       |risk AS (
       |  SELECT duration, churned, censored,
       |    sum(churned + censored) OVER (ORDER BY duration DESC) AS at_risk
       |  FROM lt),
       |hz AS (
       |  SELECT duration, at_risk, churned, censored,
       |    churned * 10000 // at_risk AS hazard_bp
       |  FROM risk)
       |SELECT CAST(duration AS BIGINT) AS duration,
       |  CAST(at_risk AS BIGINT) AS at_risk,
       |  CAST(churned AS BIGINT) AS churned,
       |  CAST(censored AS BIGINT) AS censored,
       |  CAST(hazard_bp AS BIGINT) AS hazard_bp,
       |  CAST(sum(hazard_bp) OVER (ORDER BY duration) AS BIGINT)
       |    AS cum_hazard_bp
       |FROM hz ORDER BY duration""".stripMargin) { (s, dir) =>
    val e = Tables.load(s, dir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"),
        (unix_timestamp(date_trunc("hour", col("ts"))) / 3600L)
          .cast("long").as("d"))
    val horizon = e.agg(max("d").as("mx"))
    val users = e.groupBy("user_id")
      .agg((max("d") - min("d")).as("duration"), max("d").as("last_d"))
      .crossJoin(broadcast(horizon))
      .select(col("duration"),
        when(col("last_d") >= col("mx") - (CensorHours - 1), 1L)
          .otherwise(0L).as("censored"))
    val lt = users.groupBy("duration")
      .agg(sum(lit(1L) - col("censored")).as("churned"),
        sum("censored").as("censored"))
    // ≤ #hours distinct durations: single-partition windows are fine
    val risk = lt.withColumn("at_risk",
      sum(col("churned") + col("censored"))
        .over(Window.orderBy(col("duration").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("hazard_bp",
        expr("churned * 10000 div at_risk"))
    risk
      .withColumn("cum_hazard_bp", sum("hazard_bp")
        .over(Window.orderBy("duration")))
      .select(col("duration").cast("long").as("duration"),
        col("at_risk").cast("long").as("at_risk"),
        col("churned").cast("long").as("churned"),
        col("censored").cast("long").as("censored"),
        col("hazard_bp").cast("long").as("hazard_bp"),
        col("cum_hazard_bp").cast("long").as("cum_hazard_bp"))
      .orderBy("duration")
  }

  // ------------- q352: cross-correlation matrix (exact numerators)

  private val Metrics =
    Seq("purchases", "views", "clicks", "users")

  private val q352 = Q(
    "q352_corr_matrix",
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS day,
       |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      AS purchases,
       |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS views,
       |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
       |      AS clicks,
       |    count(DISTINCT user_id) AS users
       |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
       |  GROUP BY 1),
       |m AS (
       |  SELECT day, v.name, v.x FROM daily,
       |  LATERAL (VALUES ('purchases', purchases), ('views', views),
       |    ('clicks', clicks), ('users', users)) AS v(name, x)),
       |pairs AS (
       |  SELECT a.name AS m1, b.name AS m2, count(*) AS n,
       |    sum(a.x) AS sx, sum(b.x) AS sy, sum(a.x * b.x) AS sxy,
       |    sum(a.x * a.x) AS sxx, sum(b.x * b.x) AS syy
       |  FROM m a JOIN m b ON a.day = b.day AND a.name < b.name
       |  GROUP BY 1, 2)
       |SELECT m1, m2, CAST(n AS BIGINT) AS n,
       |  CAST(n * sxy - sx * sy AS BIGINT) AS cov_num,
       |  CAST(n * sxx - sx * sx AS BIGINT) AS var1_num,
       |  CAST(n * syy - sy * sy AS BIGINT) AS var2_num
       |FROM pairs ORDER BY m1, m2""".stripMargin) { (s, dir) =>
    val daily = Tables.load(s, dir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("purchases"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("views"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("clicks"),
        countDistinct("user_id").as("users"))
    // melt to (day, name, x), then pair the ≤ #days·4 rows on day —
    // the melted table is tiny relative to events, the join is local
    val m = daily.select(col("day"), explode(map(
      Metrics.flatMap(n => Seq(lit(n), col(n).cast("long"))): _*))
      .as(Seq("name", "x")))
    m.as("a")
      .join(m.as("b"),
        col("a.day") === col("b.day") && col("a.name") < col("b.name"))
      .groupBy(col("a.name").as("m1"), col("b.name").as("m2"))
      .agg(count(lit(1)).as("n"),
        sum("a.x").as("sx"), sum("b.x").as("sy"),
        sum(col("a.x") * col("b.x")).as("sxy"),
        sum(col("a.x") * col("a.x")).as("sxx"),
        sum(col("b.x") * col("b.x")).as("syy"))
      .select(col("m1"), col("m2"), col("n").cast("long").as("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("long")
          .as("cov_num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("long")
          .as("var1_num"),
        (col("n") * col("syy") - col("sy") * col("sy")).cast("long")
          .as("var2_num"))
      .orderBy("m1", "m2")
  }

  // ------------- q353: OHLC bars with deterministic open/close

  private val q353 = Q(
    "q353_ohlc_bars",
    """WITH e AS (
      |  SELECT event_type, event_id,
      |    date_trunc('hour', ts) AS h, ts,
      |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |  FROM events
      |  WHERE ts IS NOT NULL AND value IS NOT NULL
      |    AND event_type IS NOT NULL),
      |ranked AS (
      |  SELECT event_type, h, cents,
      |    row_number() OVER (PARTITION BY event_type, h
      |      ORDER BY ts, event_id) AS rn_a,
      |    row_number() OVER (PARTITION BY event_type, h
      |      ORDER BY ts DESC, event_id DESC) AS rn_d
      |  FROM e)
      |SELECT event_type,
      |  CAST(datediff('hour', TIMESTAMP '1970-01-01 00:00:00', h)
      |    AS BIGINT) AS hour,
      |  CAST(max(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open,
      |  CAST(max(cents) AS BIGINT) AS high,
      |  CAST(min(cents) AS BIGINT) AS low,
      |  CAST(max(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM ranked GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val e = Tables.load(s, dir, "events")
      .filter(col("ts").isNotNull && col("value").isNotNull &&
        col("event_type").isNotNull)
      .select(col("event_type"), col("event_id"), col("ts"),
        date_trunc("hour", col("ts")).as("h"),
        (col("value").cast(DecimalType(12, 2)) * 100).cast("long")
          .as("cents"))
    val wA = Window.partitionBy("event_type", "h")
      .orderBy(col("ts").asc, col("event_id").asc)
    val wD = Window.partitionBy("event_type", "h")
      .orderBy(col("ts").desc, col("event_id").desc)
    e.withColumn("rn_a", row_number().over(wA))
      .withColumn("rn_d", row_number().over(wD))
      .groupBy(col("event_type"),
        (unix_timestamp(col("h")) / 3600L).cast("long").as("hour"))
      .agg(max(when(col("rn_a") === 1, col("cents"))).as("open"),
        max("cents").as("high"), min("cents").as("low"),
        max(when(col("rn_d") === 1, col("cents"))).as("close"),
        count(lit(1)).as("n"), sum("cents").as("sum_cents"))
      .select(col("event_type"), col("hour"),
        col("open").cast("long").as("open"),
        col("high").cast("long").as("high"),
        col("low").cast("long").as("low"),
        col("close").cast("long").as("close"),
        col("n").cast("long").as("n"),
        col("sum_cents").cast("long").as("sum_cents"))
      .orderBy("event_type", "hour")
  }

  val defs: Seq[Q] = Seq(q351, q352, q353)
}
