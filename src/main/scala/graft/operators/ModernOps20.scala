package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-9 surfaces, part 20 — cohort economics, basket mining, and
  * lead-lag structure:
  *
  *  - q348 cohort LTV curve: users grouped by first-seen day, exact
  *    cumulative purchase cents per cohort age (days since entry) —
  *    the lifetime-value triangle next to q163's activity retention;
  *    the cumulative sum runs per cohort over ≤ #days rows;
  *  - q349 market-basket association rules: within-order part pairs →
  *    support / confidence(both directions) / lift in exact basis
  *    points; the pair surface is per-order items² (baskets are small
  *    and bounded), never corpus²;
  *  - q350 autocorrelation profile of the daily purchase-count series:
  *    per lag 1..7 the exact integer numerators (L·Σxy − Σx·Σy over
  *    the aligned overlap) and the variance numerators — the lead-lag
  *    statistic with no floating point at all; counts keep every
  *    product far inside BIGINT at 100x.
  */
object ModernOps20 {

  // ------------- q348: cohort LTV curve

  private val q348 = Q(
    "q348_cohort_ltv",
    """WITH e AS (
      |  SELECT user_id, ts, event_type,
      |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
      |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS mo
      |  FROM events
      |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |    AND event_type IS NOT NULL),
      |first AS (SELECT user_id, min(mo) AS cohort_mo FROM e GROUP BY 1),
      |spend AS (
      |  SELECT f.cohort_mo, e.mo - f.cohort_mo AS age,
      |    sum(CASE WHEN e.event_type = 'purchase' AND e.cents IS NOT NULL
      |      THEN e.cents ELSE 0 END) AS cents,
      |    count(DISTINCT e.user_id) AS active_users
      |  FROM e JOIN first f ON f.user_id = e.user_id
      |  GROUP BY 1, 2),
      |cum AS (
      |  SELECT cohort_mo, age, cents, active_users,
      |    sum(cents) OVER (PARTITION BY cohort_mo ORDER BY age)
      |      AS cum_cents
      |  FROM spend)
      |SELECT CAST(cohort_mo AS BIGINT) AS cohort_mo,
      |  CAST(age AS BIGINT) AS age,
      |  CAST(active_users AS BIGINT) AS active_users,
      |  CAST(cents AS BIGINT) AS cents,
      |  CAST(cum_cents AS BIGINT) AS cum_cents
      |FROM cum ORDER BY cohort_mo, age""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val e = Tables.load(s, dir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .select(col("user_id"), col("event_type"),
        (col("value").cast(DecimalType(12, 2)) * 100).cast("long")
          .as("cents"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long")
          .as("mo"))
    val first = e.groupBy("user_id").agg(min("mo").as("cohort_mo"))
    val spend = e.join(first, "user_id")
      .groupBy(col("cohort_mo"), (col("mo") - col("cohort_mo")).as("age"))
      .agg(sum(when(col("event_type") === "purchase" &&
          col("cents").isNotNull, col("cents")).otherwise(0L))
          .as("cents"),
        countDistinct("user_id").as("active_users"))
    spend
      .withColumn("cum_cents", sum("cents").over(
        Window.partitionBy("cohort_mo").orderBy("age")))
      .select(col("cohort_mo").cast("long").as("cohort_mo"),
        col("age").cast("long").as("age"),
        col("active_users").cast("long").as("active_users"),
        col("cents").cast("long").as("cents"),
        col("cum_cents").cast("long").as("cum_cents"))
      .orderBy("cohort_mo", "age")
  }

  // ------------- q349: market-basket association rules

  private val MinPairSupport = 3

  private val q349 = Q(
    "q349_basket_rules",
    s"""WITH items AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
       |  FROM lineitem
       |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
       |nb AS (SELECT count(DISTINCT ok) AS n_baskets FROM items),
       |isup AS (SELECT pk, count(*) AS s FROM items GROUP BY 1),
       |pairs AS (
       |  SELECT a.pk AS p1, b.pk AS p2, count(*) AS s12
       |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
       |  GROUP BY 1, 2
       |  HAVING count(*) >= $MinPairSupport)
       |SELECT p.p1, p.p2, CAST(p.s12 AS BIGINT) AS s12,
       |  CAST(i1.s AS BIGINT) AS s1, CAST(i2.s AS BIGINT) AS s2,
       |  CAST(p.s12 * 10000 // nb.n_baskets AS BIGINT) AS support_bp,
       |  CAST(p.s12 * 10000 // i1.s AS BIGINT) AS conf_1to2_bp,
       |  CAST(p.s12 * 10000 // i2.s AS BIGINT) AS conf_2to1_bp,
       |  CAST(p.s12 * nb.n_baskets * 10000 // (i1.s * i2.s) AS BIGINT)
       |    AS lift_bp
       |FROM pairs p
       |JOIN isup i1 ON i1.pk = p.p1 JOIN isup i2 ON i2.pk = p.p2
       |CROSS JOIN nb
       |ORDER BY p1, p2""".stripMargin) { (s, dir) =>
    val items = Tables.load(s, dir, "lineitem")
      .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
      .localCheckpoint() // reused for supports and the pair join
    val nb = items.select(countDistinct("ok").as("n_baskets"))
    val isup = items.groupBy("pk").agg(count(lit(1)).as("s"))
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("p1"), col("b.pk").as("p2"))
      .agg(count(lit(1)).as("s12"))
      .filter(col("s12") >= MinPairSupport)
    pairs
      .join(isup.select(col("pk").as("p1"), col("s").as("s1")), "p1")
      .join(isup.select(col("pk").as("p2"), col("s").as("s2")), "p2")
      .crossJoin(broadcast(nb))
      .select(col("p1"), col("p2"), col("s12").cast("long").as("s12"),
        col("s1").cast("long").as("s1"), col("s2").cast("long").as("s2"),
        expr("s12 * 10000 div n_baskets").cast("long").as("support_bp"),
        expr("s12 * 10000 div s1").cast("long").as("conf_1to2_bp"),
        expr("s12 * 10000 div s2").cast("long").as("conf_2to1_bp"),
        expr("s12 * n_baskets * 10000 div (s1 * s2)").cast("long")
          .as("lift_bp"))
      .orderBy("p1", "p2")
  }

  // ------------- q350: autocorrelation profile (exact numerators)

  private val MaxLag = 7

  private val q350 = Q(
    "q350_acf_profile",
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS d, count(*) AS y
       |  FROM events
       |  WHERE ts IS NOT NULL AND event_type = 'purchase'
       |  GROUP BY 1),
       |idx AS (
       |  SELECT y, datediff('day', DATE '1970-01-01', d) AS t FROM daily),
       |lags AS (SELECT unnest(range(1, ${MaxLag + 1})) AS lag),
       |joined AS (
       |  SELECT l.lag, a.y AS x, b.y AS z
       |  FROM lags l JOIN idx a ON TRUE
       |  JOIN idx b ON b.t = a.t + l.lag),
       |agg AS (
       |  SELECT lag, count(*) AS n, sum(x) AS sx, sum(z) AS sz,
       |    sum(x * z) AS sxz, sum(x * x) AS sxx, sum(z * z) AS szz
       |  FROM joined GROUP BY 1)
       |SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n,
       |  CAST(n * sxz - sx * sz AS BIGINT) AS cov_num,
       |  CAST(n * sxx - sx * sx AS BIGINT) AS varx_num,
       |  CAST(n * szz - sz * sz AS BIGINT) AS varz_num
       |FROM agg ORDER BY lag""".stripMargin) { (s, dir) =>
    import s.implicits._
    val daily = Tables.load(s, dir, "events")
      .filter(col("ts").isNotNull && col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("y"))
      .select(col("y"), datediff(col("d"), lit("1970-01-01")).as("t"))
      .localCheckpoint() // tiny (#days rows), joined once per lag
    val lags = (1 to MaxLag).toDF("lag")
    val joined = broadcast(lags).join(daily.as("a"), lit(true))
      .join(daily.select(col("y").as("z"), col("t").as("t2")),
        col("t2") === col("t") + col("lag"))
    joined.groupBy("lag")
      .agg(count(lit(1)).as("n"), sum("y").as("sx"), sum("z").as("sz"),
        sum(col("y") * col("z")).as("sxz"),
        sum(col("y") * col("y")).as("sxx"),
        sum(col("z") * col("z")).as("szz"))
      .select(col("lag").cast("long").as("lag"),
        col("n").cast("long").as("n"),
        (col("n") * col("sxz") - col("sx") * col("sz")).cast("long")
          .as("cov_num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("long")
          .as("varx_num"),
        (col("n") * col("szz") - col("sz") * col("sz")).cast("long")
          .as("varz_num"))
      .orderBy("lag")
  }

  val defs: Seq[Q] = Seq(q348, q349, q350)
}
