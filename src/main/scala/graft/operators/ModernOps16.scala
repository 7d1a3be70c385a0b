package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Round-9 surfaces, part 16 — counterfactual evaluation, privacy
  * tokenization, and three-valued-logic join semantics:
  *
  *  - q334 inverse-propensity-scored (IPS) offline policy evaluation:
  *    logged (context, action, reward) tuples under a declared uniform
  *    logging policy (propensity 1/K) evaluate a DETERMINISTIC target
  *    policy (each user's modal action from the even-id half) on the
  *    odd-id half — IPS and self-normalized IPS (SNIPS) values in
  *    exact integer basis points, the replay estimator a
  *    recommendation pipeline runs before an online A/B;
  *  - q335 pseudonymization with referential integrity: peppered
  *    SHA-256 tokens replace user ids; the audit proves the token
  *    space preserves the join structure (one source id per token,
  *    event counts preserved) — the reversible-only-with-pepper
  *    de-identification step before sharing a corpus;
  *  - q336 NOT IN vs anti-join three-valued logic: the same exclusion
  *    list with and without its NULLs — `NOT IN` over a NULL-bearing
  *    list is vacuously empty, while filtering the NULLs (or an anti
  *    join, which is null-rejecting on the key) gives the intended
  *    answer; Spark plans the raw form as a null-aware anti join.
  */
object ModernOps16 {

  // ------------- q334: IPS offline policy evaluation

  private val IpsK = 5 // declared uniform logging policy over K actions

  private val q334 = Q(
    "q334_ips_policy_eval",
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type AS action,
       |    CASE WHEN value > 100 THEN 1 ELSE 0 END AS r
       |  FROM events
       |  WHERE user_id IS NOT NULL AND event_id IS NOT NULL
       |    AND event_type IS NOT NULL AND value IS NOT NULL),
       |tr AS (
       |  SELECT user_id, action, count(*) AS cnt
       |  FROM e WHERE event_id % 2 = 0 GROUP BY 1, 2),
       |pol AS (
       |  SELECT user_id, action AS pi_action FROM (
       |    SELECT user_id, action, row_number() OVER (
       |      PARTITION BY user_id ORDER BY cnt DESC, action) AS rn
       |    FROM tr) WHERE rn = 1),
       |lg AS (
       |  SELECT e.user_id, e.action, e.r,
       |    CASE WHEN p.pi_action = e.action THEN 1 ELSE 0 END AS m
       |  FROM e JOIN pol p ON p.user_id = e.user_id
       |  WHERE e.event_id % 2 = 1),
       |per AS (
       |  SELECT action, count(*) AS n_logged, sum(m) AS n_match,
       |    sum(r * m) AS r_match
       |  FROM lg GROUP BY 1),
       |tot AS (
       |  SELECT 'TOTAL' AS action, count(*) AS n_logged,
       |    sum(m) AS n_match, sum(r * m) AS r_match
       |  FROM lg),
       |u AS (SELECT * FROM per UNION ALL SELECT * FROM tot),
       |n AS (SELECT n_logged AS nt FROM tot)
       |SELECT u.action, CAST(u.n_logged AS BIGINT) AS n_logged,
       |  CAST(u.n_match AS BIGINT) AS n_match,
       |  CAST(u.r_match AS BIGINT) AS r_match,
       |  CAST(u.r_match * $IpsK * 10000 // n.nt AS BIGINT) AS ips_bp,
       |  CAST(CASE WHEN u.n_match > 0
       |    THEN u.r_match * 10000 // u.n_match ELSE 0 END AS BIGINT)
       |    AS snips_bp
       |FROM u CROSS JOIN n ORDER BY action""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val e = Tables.load(s, dir, "events")
      .filter(col("user_id").isNotNull && col("event_id").isNotNull &&
        col("event_type").isNotNull && col("value").isNotNull)
      .select(col("user_id"), col("event_id"),
        col("event_type").as("action"),
        when(col("value") > 100, 1L).otherwise(0L).as("r"))
    val pol = e.filter(col("event_id") % 2 === 0)
      .groupBy("user_id", "action").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(Window.partitionBy("user_id")
        .orderBy(col("cnt").desc, col("action"))))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("action").as("pi_action"))
    val lg = e.filter(col("event_id") % 2 === 1)
      .join(pol, "user_id")
      .withColumn("m",
        when(col("pi_action") === col("action"), 1L).otherwise(0L))
      .localCheckpoint()
    val per = lg.groupBy("action")
      .agg(count(lit(1)).as("n_logged"), sum("m").as("n_match"),
        sum(col("r") * col("m")).as("r_match"))
    val tot = lg.agg(count(lit(1)).as("n_logged"),
      sum("m").as("n_match"),
      sum(col("r") * col("m")).as("r_match"))
      .withColumn("action", lit("TOTAL"))
      .select("action", "n_logged", "n_match", "r_match")
    val n = tot.select(col("n_logged").as("nt"))
    per.unionByName(tot).crossJoin(broadcast(n))
      .select(col("action"), col("n_logged").cast("long").as("n_logged"),
        col("n_match").cast("long").as("n_match"),
        col("r_match").cast("long").as("r_match"),
        expr(s"r_match * $IpsK * 10000 div nt").cast("long").as("ips_bp"),
        when(col("n_match") > 0, expr("r_match * 10000 div n_match"))
          .otherwise(0L).cast("long").as("snips_bp"))
      .orderBy("action")
  }

  // ------------- q335: pseudonymization with referential integrity

  private val Pepper = "graft-pepper-2026"

  private val q335 = Q(
    "q335_pseudonymize_integrity",
    s"""WITH e AS (
       |  SELECT user_id, event_id FROM events
       |  WHERE user_id IS NOT NULL AND event_id IS NOT NULL),
       |tok AS (
       |  SELECT user_id, event_id,
       |    substr(sha256('$Pepper:' || CAST(user_id AS VARCHAR)), 1, 16)
       |      AS token
       |  FROM e)
       |SELECT token, CAST(count(*) AS BIGINT) AS n_events,
       |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_source_ids,
       |  CAST(min(event_id) AS BIGINT) AS min_event_id
       |FROM tok GROUP BY token ORDER BY token""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .filter(col("user_id").isNotNull && col("event_id").isNotNull)
      .select(col("user_id"), col("event_id"),
        substring(sha2(concat(lit(s"$Pepper:"),
          col("user_id").cast("string")), 256), 1, 16).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_source_ids"),
        min("event_id").as("min_event_id"))
      .select(col("token"), col("n_events").cast("long").as("n_events"),
        col("n_source_ids").cast("long").as("n_source_ids"),
        col("min_event_id").cast("long").as("min_event_id"))
      .orderBy("token")
  }

  // ------------- q336: NOT IN vs anti join under NULLs

  /** The exclusion list: part keys of low-quantity lineitems, with a
    * NULL injected for every quantity-below-2 row — NULL-bearing by
    * construction at every corpus. */
  private val ExclusionSql =
    """SELECT CASE WHEN l_quantity < 2 THEN NULL ELSE l_partkey END AS pk
      |FROM lineitem WHERE l_quantity <= 5""".stripMargin

  private val q336 = Q(
    "q336_null_aware_anti_join",
    s"""WITH ex AS ($ExclusionSql),
       |raw AS (
       |  SELECT count(*) AS n FROM part
       |  WHERE p_partkey NOT IN (SELECT pk FROM ex)),
       |nonnull AS (
       |  SELECT count(*) AS n FROM part
       |  WHERE p_partkey NOT IN (SELECT pk FROM ex WHERE pk IS NOT NULL)),
       |aj AS (
       |  SELECT count(*) AS n FROM part a
       |  WHERE NOT EXISTS (SELECT 1 FROM ex WHERE ex.pk = a.p_partkey))
       |SELECT 'not_in_raw' AS variant, CAST(n AS BIGINT) AS n FROM raw
       |UNION ALL
       |SELECT 'not_in_nonnull', CAST(n AS BIGINT) FROM nonnull
       |UNION ALL
       |SELECT 'anti_join', CAST(n AS BIGINT) FROM aj
       |ORDER BY variant""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.registerAll(s, dir)
    s.sql(
      s"""WITH ex AS ($ExclusionSql),
         |raw AS (
         |  SELECT count(*) AS n FROM part
         |  WHERE p_partkey NOT IN (SELECT pk FROM ex)),
         |nonnull AS (
         |  SELECT count(*) AS n FROM part
         |  WHERE p_partkey NOT IN
         |    (SELECT pk FROM ex WHERE pk IS NOT NULL)),
         |aj AS (
         |  SELECT count(*) AS n FROM part a
         |  WHERE NOT EXISTS (SELECT 1 FROM ex WHERE ex.pk = a.p_partkey))
         |SELECT 'not_in_raw' AS variant, CAST(n AS BIGINT) AS n FROM raw
         |UNION ALL
         |SELECT 'not_in_nonnull', CAST(n AS BIGINT) FROM nonnull
         |UNION ALL
         |SELECT 'anti_join', CAST(n AS BIGINT) FROM aj
         |ORDER BY variant""".stripMargin)
  }

  /** Exposed for the spec: the raw NOT IN frame whose physical plan
    * must be a null-aware anti join. */
  private[graft] def rawNotInFrame(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      s"""SELECT p_partkey FROM part
         |WHERE p_partkey NOT IN (SELECT pk FROM ($ExclusionSql))"""
        .stripMargin)
  }

  val defs: Seq[Q] = Seq(q334, q335, q336)
}
