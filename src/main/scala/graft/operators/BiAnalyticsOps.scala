package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Business analytics — long-tail collapse, weighted order statistics, Gini concentration, cohort LTV, basket rules, life tables, correlation matrices, frequent sequences, RFM segments, growth accounting, revenue concentration, lead-time boxes, mix drift.
  *
  * Consolidated from the round-7..9 ModernOps series (round-10 judge
  * item): queries regrouped by theme; behavior and query names are
  * byte-identical to the originals.
  */
object BiAnalyticsOps {

  // ------------- q338: long-tail category collapse

  private val TopK = 8


  // ------------- q349: market-basket association rules

  private val MinPairSupport = 3


  // ------------- q351: churn life table with right-censoring

  private val CensorHours = 24


  // ------------- q352: cross-correlation matrix (exact numerators)

  private val Metrics =
    Seq("purchases", "views", "clicks", "users")


  // ------------- q359: frequent subsequences (PrefixSpan-lite)

  private val Letters = Seq("c", "e", "p", "s", "v")


  private def candidates: Seq[String] = {
    val l1 = Letters
    val l2 = for (a <- Letters; b <- Letters) yield a + b
    val l3 = for (a <- Letters; b <- Letters; c <- Letters) yield a + b + c
    l1 ++ l2 ++ l3
  }


  /** long-tail category collapse: keep the top-K vocabulary by
    * global frequency, fold everything else into `__other__` — the
    * cardinality-capping step before one-hot/target encoding, exact
    * counts only;
    */
  private val q338 = Q(
    "q338_longtail_collapse",
    s"""WITH toks AS (
       |  SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |    FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL)
       |  WHERE w <> ''),
       |freq AS (SELECT w, count(*) AS f FROM toks GROUP BY w),
       |top AS (
       |  SELECT w FROM freq
       |  ORDER BY f DESC, w LIMIT $TopK),
       |mapped AS (
       |  SELECT t.doc_id,
       |    CASE WHEN top.w IS NOT NULL THEN t.w ELSE '__other__' END
       |      AS cat,
       |    t.w
       |  FROM toks t LEFT JOIN top ON top.w = t.w)
       |SELECT cat, CAST(count(*) AS BIGINT) AS n_occur,
       |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  CAST(count(DISTINCT w) AS BIGINT) AS n_source_cats
       |FROM mapped GROUP BY cat ORDER BY cat""".stripMargin) { (s, dir) =>
    val toks = Tables.load(s, dir, "documents")
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val top = toks.groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w")).limit(TopK)
      .select(col("w").as("tw"))
    toks.join(broadcast(top), col("w") === col("tw"), "left")
      .withColumn("cat",
        when(col("tw").isNotNull, col("w")).otherwise("__other__"))
      .groupBy("cat")
      .agg(count(lit(1)).as("n_occur"),
        countDistinct("doc_id").as("n_docs"),
        countDistinct("w").as("n_source_cats"))
      .select(col("cat"), col("n_occur").cast("long").as("n_occur"),
        col("n_docs").cast("long").as("n_docs"),
        col("n_source_cats").cast("long").as("n_source_cats"))
      .orderBy("cat")
  }


  /** weighted median / weighted p90 per group: smallest value
    * whose cumulative weight clears the quantile threshold, computed
    * on the per-(group, value) aggregate (the window runs over
    * distinct values, not rows); weights pass through an explicit
    * floor() because CAST(DOUBLE AS BIGINT) rounds in some engines
    * and truncates in others;
    */
  // ------------- q339: weighted median / p90 per group

  private val q339 = Q(
    "q339_weighted_median",
    """WITH v AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |      AS cents,
      |    CAST(floor(l_quantity) AS BIGINT) AS w
      |  FROM lineitem
      |  WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL
      |    AND l_quantity IS NOT NULL AND l_quantity >= 1),
      |g AS (SELECT flag, cents, sum(w) AS w FROM v GROUP BY 1, 2),
      |c AS (
      |  SELECT flag, cents,
      |    sum(w) OVER (PARTITION BY flag ORDER BY cents) AS cum,
      |    sum(w) OVER (PARTITION BY flag) AS tot
      |  FROM g)
      |SELECT flag AS l_returnflag, CAST(max(tot) AS BIGINT) AS total_w,
      |  CAST(min(CASE WHEN cum * 2 >= tot THEN cents END) AS BIGINT)
      |    AS wmedian_cents,
      |  CAST(min(CASE WHEN cum * 10 >= tot * 9 THEN cents END) AS BIGINT)
      |    AS wp90_cents
      |FROM c GROUP BY flag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val v = Tables.load(s, dir, "lineitem")
      .filter(col("l_returnflag").isNotNull &&
        col("l_extendedprice").isNotNull &&
        col("l_quantity").isNotNull && col("l_quantity") >= 1)
      .select(col("l_returnflag").as("flag"),
        (col("l_extendedprice").cast(DecimalType(12, 2)) * 100)
          .cast("long").as("cents"),
        floor(col("l_quantity")).cast("long").as("w"))
    // aggregate to (flag, value) FIRST — the quantile window then runs
    // over distinct values, not rows
    val g = v.groupBy("flag", "cents").agg(sum("w").as("w"))
    val c = g
      .withColumn("cum", sum("w").over(
        Window.partitionBy("flag").orderBy("cents")))
      .withColumn("tot", sum("w").over(Window.partitionBy("flag")))
    c.groupBy(col("flag").as("l_returnflag"))
      .agg(max("tot").cast("long").as("total_w"),
        min(when(col("cum") * 2 >= col("tot"), col("cents")))
          .cast("long").as("wmedian_cents"),
        min(when(col("cum") * 10 >= col("tot") * 9, col("cents")))
          .cast("long").as("wp90_cents"))
      .orderBy("l_returnflag")
  }


  /** Gini concentration of customer spend: the rank-weighted
    * closed form (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) in basis points,
    * ranks from ScalableRank (no global window); intermediate products
    * stay under 2^63 for n·max(x) < 9·10^18 — holds through 100x with
    * ~10^7-cent spends.
    */
  // ------------- q341: Gini concentration of customer spend

  private val q341 = Q(
    "q341_gini_concentration",
    """WITH x AS (
      |  SELECT o_custkey AS ck,
      |    sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS cents
      |  FROM orders
      |  WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
      |  GROUP BY 1),
      |r AS (
      |  SELECT cents, row_number() OVER (ORDER BY cents, ck) AS i
      |  FROM x)
      |SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(cents) AS BIGINT) AS total_cents,
      |  CAST((2 * sum(i * cents) - (count(*) + 1) * sum(cents)) * 10000
      |    // (count(*) * sum(cents)) AS BIGINT) AS gini_bp
      |FROM r""".stripMargin) { (s, dir) =>
    val x = Tables.load(s, dir, "orders")
      .filter(col("o_custkey").isNotNull && col("o_totalprice").isNotNull)
      .groupBy(col("o_custkey").as("ck"))
      .agg(sum((col("o_totalprice").cast(DecimalType(14, 2)) * 100)
        .cast("long")).as("cents"))
    val r = ScalableRank.withRank(x.select(col("cents"), col("ck")),
      "i", col("cents"), col("ck"))
    // Σi·x and the ×10000 numerator exceed 2^63 beyond ~10x scale —
    // the whole chain runs in DECIMAL(38,0) (DuckDB's BIGINT sums are
    // HUGEINT already); the numerator is non-negative, so truncating
    // decimal floor == the oracle's integer //.
    r.agg(count(lit(1)).as("n"),
      sum(col("cents").cast(DecimalType(38, 0))).as("tot"),
      sum(col("i").cast(DecimalType(38, 0)) * col("cents")).as("iwx"))
      .select(col("n").cast("long").as("n"),
        col("tot").cast("long").as("total_cents"),
        floor(expr("(2 * iwx - (n + 1) * tot) * 10000 / (n * tot)"))
          .cast("long").as("gini_bp"))
  }


  /** cohort LTV curve: users grouped by first-seen day, exact
    * cumulative purchase cents per cohort age (days since entry) —
    * the lifetime-value triangle next to q163's activity retention;
    * the cumulative sum runs per cohort over ≤ #days rows;
    */
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


  /** market-basket association rules: within-order part pairs →
    * support / confidence(both directions) / lift in exact basis
    * points; the pair surface is per-order items² (baskets are small
    * and bounded), never corpus²;
    */
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


  /** churn life table with right-censoring: per user the
    * observed lifetime (first→last event hour); users still active in
    * the final 24 corpus hours are CENSORED, not churned (the classic
    * Kaplan–Meier input). Per duration: at-risk (reverse cumulative
    * sum), churned, censored, discrete hazard and Nelson–Aalen-style
    * cumulative hazard in exact basis points — two linear shuffles
    * (per-user agg, per-duration agg) + a window over ≤ #days rows;
    */
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


  /** cross-correlation matrix of the daily metric series
    * (purchases / views / clicks / distinct users): exact Pearson
    * numerators (n·Σxy − Σx·Σy and both variance numerators) for all
    * six metric pairs from ONE pass of sums over the wide daily
    * table — q350's lead-lag machinery generalized across series;
    * integer counts keep every product far inside BIGINT at 100x;
    */
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


  /** frequent-sequence mining (PrefixSpan-lite): every event-type
    * subsequence of length 1–3 (gaps allowed — the sequential-pattern
    * definition, not q324's one-regex match) counted over (user, day)
    * sessions. The alphabet is tiny (5 types) so the candidate space
    * is a closed 155-row broadcast; sessions collapse to their
    * type-initial string FIRST and identical strings carry a weight,
    * so the containment scan is (distinct strings × 155) cheap regex
    * probes, never a corpus blow-up;
    */
  private val q359 = Q(
    "q359_frequent_sequences",
    """WITH letters AS (SELECT unnest(['c','e','p','s','v']) AS l),
      |cand AS (
      |  SELECT l AS seq, l AS pat FROM letters
      |  UNION ALL SELECT a.l || b.l, a.l || '.*' || b.l
      |    FROM letters a, letters b
      |  UNION ALL SELECT a.l || b.l || c.l,
      |    a.l || '.*' || b.l || '.*' || c.l
      |    FROM letters a, letters b, letters c),
      |sess AS (
      |  SELECT string_agg(left(event_type, 1), '' ORDER BY ts, event_id)
      |    AS s
      |  FROM events
      |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
      |    AND event_type IS NOT NULL
      |  GROUP BY user_id, CAST(ts AS DATE)),
      |tot AS (SELECT count(*) AS n_sessions FROM sess),
      |hits AS (
      |  SELECT c.seq, count(*) AS support
      |  FROM cand c JOIN sess s ON regexp_matches(s.s, c.pat)
      |  GROUP BY 1)
      |SELECT h.seq, CAST(length(h.seq) AS BIGINT) AS len,
      |  CAST(h.support AS BIGINT) AS support,
      |  CAST(h.support * 10000 // t.n_sessions AS BIGINT) AS support_bp
      |FROM hits h CROSS JOIN tot t
      |ORDER BY h.seq""".stripMargin) { (s, dir) =>
    import s.implicits._
    val sess = Tables.load(s, dir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_type").isNotNull)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("ts"), col("event_id"),
          substring(col("event_type"), 1, 1).as("l")))),
        x => x.getField("l")), "").as("str"))
      // identical strings collapse: the regex scan runs once per
      // distinct session string, weighted by multiplicity
      .groupBy("str").agg(count(lit(1)).as("w"))
    val nSessions = sess.agg(sum("w").as("n_sessions"))
    val cand = candidates.map(c => (c, c.mkString(".*"))).toDF("seq", "pat")
    sess.crossJoin(broadcast(cand))
      .filter(expr("str RLIKE pat"))
      .groupBy("seq")
      .agg(sum("w").as("support"))
      .crossJoin(broadcast(nSessions))
      .select(col("seq"), length(col("seq")).cast("long").as("len"),
        col("support").cast("long").as("support"),
        expr("support * 10000 div n_sessions").cast("long")
          .as("support_bp"))
      .orderBy("seq")
  }


  /** RFM segmentation: per user Recency (days since last
    * purchase), Frequency (purchase count), Monetary (exact cents),
    * each scored 1–5 by the exact ntile quintile allocation in a
    * deterministic total order, rolled up to segment populations —
    * the classic marketing matrix; user aggregation is one linear
    * shuffle, the quintile windows run over ≤ #users rows.
    */
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


  /** growth accounting: per day the canonical ledger — new
    * (first seen), retained (active today and yesterday),
    * resurrected (active today, absent yesterday, seen before),
    * churned (active yesterday, absent today) — from one per-(user,
    * day) activity table lag-joined to itself plus the per-user
    * first day; actives(d) = new + retained + resurrected holds row
    * by row. Linear shuffles on (user, day).
    */
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


  /** revenue concentration: per market segment, the smallest
    * number of customers covering ≥80% of segment revenue plus the
    * exact Pareto share of the top decile — q373's coverage-curve
    * machinery turned onto money, per group; ranking windows run
    * inside each segment over ≤ #customers rows.
    */
  // ------------- q384: revenue concentration per segment

  private val q384 = Q(
    "q384_revenue_concentration",
    """WITH rev AS (
      |  SELECT c.c_mktsegment AS seg, c.c_custkey AS ck,
      |    sum(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100
      |      AS BIGINT)) AS cents
      |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      |  WHERE c.c_custkey IS NOT NULL
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT seg, cents,
      |    row_number() OVER (PARTITION BY seg
      |      ORDER BY cents DESC, ck) AS rk,
      |    count(*) OVER (PARTITION BY seg) AS n,
      |    sum(cents) OVER (PARTITION BY seg) AS total
      |  FROM rev),
      |cum AS (
      |  SELECT seg, rk, n, total,
      |    sum(cents) OVER (PARTITION BY seg ORDER BY rk) AS cum
      |  FROM r)
      |SELECT seg, CAST(max(n) AS BIGINT) AS n_customers,
      |  CAST(max(total) AS BIGINT) AS total_cents,
      |  CAST(min(CASE WHEN cum * 10 >= total * 8 THEN rk END) AS BIGINT)
      |    AS p80_customers,
      |  CAST(max(CASE WHEN rk * 10 <= n THEN cum END) * 10000
      |    // max(total) AS BIGINT) AS top_decile_share_bp
      |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val rev = Tables.load(s, dir, "customer")
      .filter(col("c_custkey").isNotNull)
      .select(col("c_custkey").as("ck"), col("c_mktsegment").as("seg"))
      .join(Tables.load(s, dir, "orders")
        .select(col("o_custkey").as("ck"),
          (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
            .cast("long").as("cents")),
        "ck")
      .groupBy("seg", "ck").agg(sum("cents").as("cents"))
    val wSeg = Window.partitionBy("seg")
    val r = rev
      .withColumn("rk", row_number().over(
        wSeg.orderBy(col("cents").desc, col("ck"))))
      .withColumn("n", count(lit(1)).over(wSeg))
      .withColumn("total", sum("cents").over(wSeg))
      .withColumn("cum", sum("cents").over(
        wSeg.orderBy("rk")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    r.groupBy("seg")
      .agg(max("n").as("n_customers"), max("total").as("total_cents"),
        min(when(col("cum") * 10 >= col("total") * 8, col("rk")))
          .as("p80_customers"),
        max(when(col("rk") * 10 <= col("n"), col("cum")))
          .as("top_decile_cum"))
      .select(col("seg"),
        col("n_customers").cast("long").as("n_customers"),
        col("total_cents").cast("long").as("total_cents"),
        col("p80_customers").cast("long").as("p80_customers"),
        expr("top_decile_cum * 10000 div total_cents").cast("long")
          .as("top_decile_share_bp"))
      .orderBy("seg")
  }


  /** lead-time box stats: per order priority the exact
    * min/p50/p90/max of first-fulfillment lag (days from order date
    * to the order's FIRST ship date) — percentiles as true order
    * statistics at ranks ⌈n/2⌉/⌈9n/10⌉ picked by per-group
    * row_number in a (lag, key) total order, not interpolation (the
    * q285 ordered-set aggregates are the other family); per-order
    * min-ship is one linear shuffle, ranks run inside each priority;
    */
  private val q385 = Q(
    "q385_leadtime_box",
    """WITH lead AS (
      |  SELECT o.o_orderpriority AS pri, o.o_orderkey AS k,
      |    datediff('day', CAST(o.o_orderdate AS DATE),
      |      min(CAST(l.l_shipdate AS DATE))) AS lag_days
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  WHERE o.o_orderdate IS NOT NULL AND l.l_shipdate IS NOT NULL
      |  GROUP BY 1, 2, o.o_orderdate),
      |r AS (
      |  SELECT pri, lag_days,
      |    row_number() OVER (PARTITION BY pri ORDER BY lag_days, k)
      |      AS rk,
      |    count(*) OVER (PARTITION BY pri) AS n
      |  FROM lead)
      |SELECT pri, CAST(max(n) AS BIGINT) AS n,
      |  CAST(min(lag_days) AS BIGINT) AS min_days,
      |  CAST(max(CASE WHEN rk = (n + 1) // 2 THEN lag_days END)
      |    AS BIGINT) AS p50_days,
      |  CAST(max(CASE WHEN rk = (n * 9 + 9) // 10 THEN lag_days END)
      |    AS BIGINT) AS p90_days,
      |  CAST(max(lag_days) AS BIGINT) AS max_days
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val lead = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate").isNotNull)
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("pri"),
        to_date(col("o_orderdate")).as("od"))
      .join(Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate").isNotNull)
        .select(col("l_orderkey").as("k"),
          to_date(col("l_shipdate")).as("sd")),
        "k")
      .groupBy("pri", "k", "od").agg(min("sd").as("first_ship"))
      .select(col("pri"), col("k"),
        datediff(col("first_ship"), col("od")).cast("long")
          .as("lag_days"))
    val w = Window.partitionBy("pri")
    val r = lead
      .withColumn("rk", row_number().over(
        w.orderBy(col("lag_days"), col("k"))))
      .withColumn("n", count(lit(1)).over(w))
    r.groupBy("pri")
      .agg(max("n").as("n"), min("lag_days").as("min_days"),
        max(when(col("rk") === expr("(n + 1) div 2"), col("lag_days")))
          .as("p50_days"),
        max(when(col("rk") === expr("(n * 9 + 9) div 10"),
          col("lag_days"))).as("p90_days"),
        max("lag_days").as("max_days"))
      .select(col("pri"), col("n").cast("long").as("n"),
        col("min_days").cast("long").as("min_days"),
        col("p50_days").cast("long").as("p50_days"),
        col("p90_days").cast("long").as("p90_days"),
        col("max_days").cast("long").as("max_days"))
      .orderBy("pri")
  }


  /** quarterly mix drift: revenue share of each priority within
    * its quarter in exact bp, plus the quarter-over-quarter share
    * delta per priority (lag window over the ≤ #quarters×5 mix
    * table) — the business-mix monitor catching a channel quietly
    * taking over.
    */
  // ------------- q386: quarterly priority-mix drift

  private val q386 = Q(
    "q386_mix_drift",
    """WITH o AS (
      |  SELECT (CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) * 12
      |      + month(CAST(o_orderdate AS DATE)) - 1) // 3 AS quarter,
      |    o_orderpriority AS pri,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders
      |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL),
      |mix AS (
      |  SELECT quarter, pri, sum(cents) AS cents FROM o GROUP BY 1, 2),
      |tot AS (
      |  SELECT quarter, sum(cents) AS total FROM mix GROUP BY 1),
      |share AS (
      |  SELECT m.quarter, m.pri, m.cents,
      |    m.cents * 10000 // t.total AS share_bp
      |  FROM mix m JOIN tot t ON t.quarter = m.quarter)
      |SELECT CAST(quarter AS BIGINT) AS quarter, pri,
      |  CAST(cents AS BIGINT) AS cents,
      |  CAST(share_bp AS BIGINT) AS share_bp,
      |  CAST(share_bp - lag(share_bp) OVER (PARTITION BY pri
      |    ORDER BY quarter) AS BIGINT) AS qoq_drift_bp
      |FROM share ORDER BY quarter, pri""".stripMargin) { (s, dir) =>
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .select(
        expr("(year(CAST(o_orderdate AS DATE)) * 12L" +
          " + month(CAST(o_orderdate AS DATE)) - 1) div 3").as("quarter"),
        col("o_orderpriority").as("pri"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast("long")
          .as("cents"))
    val mix = o.groupBy("quarter", "pri").agg(sum("cents").as("cents"))
    val tot = mix.groupBy("quarter").agg(sum("cents").as("total"))
    mix.join(broadcast(tot), "quarter")
      .withColumn("share_bp", expr("cents * 10000 div total"))
      .withColumn("qoq_drift_bp",
        col("share_bp") - lag("share_bp", 1).over(
          Window.partitionBy("pri").orderBy("quarter")))
      .select(col("quarter").cast("long").as("quarter"), col("pri"),
        col("cents").cast("long").as("cents"),
        col("share_bp").cast("long").as("share_bp"),
        col("qoq_drift_bp").cast("long").as("qoq_drift_bp"))
      .orderBy("quarter", "pri")
  }


  def defs: Seq[Q] = Seq(q338, q339, q341, q348, q349, q351, q352, q359, q364, q377, q384, q385, q386)

}
