package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Privacy / compliance operators — k-anonymity ladders, pseudonymization with integrity checks, subject-access assembly.
  *
  * Consolidated from the round-7..9 ModernOps series (round-10 judge
  * item): queries regrouped by theme; behavior and query names are
  * byte-identical to the originals.
  */
object PrivacyOps {

  // ------------- q328: k-anonymity generalization ladder

  private val KAnon = 3


  // ------------- q335: pseudonymization with referential integrity

  private val Pepper = "graft-pepper-2026"


  /** k-anonymity generalization ladder: every doc's
    * quasi-identifier tuple (lang, source, size bucket) is checked
    * against k=3 at four generalization levels (fine bucket → coarse
    * bucket → drop size → lang only) and labeled with the minimal
    * level that reaches k — the privacy audit a training corpus runs
    * before release, counts-only and NULL-group-consistent (window
    * counts, not joins, so NULL quasi-identifiers stay grouped);
    */
  private val q328 = Q(
    "q328_k_anonymity_ladder",
    s"""WITH d AS (
       |  SELECT doc_id, lang, source,
       |    greatest(n_chars, 0) // 100 AS b_fine,
       |    greatest(n_chars, 0) // 1000 AS b_coarse
       |  FROM documents WHERE doc_id IS NOT NULL),
       |w AS (
       |  SELECT doc_id,
       |    count(*) OVER (PARTITION BY lang, source, b_fine) AS c0,
       |    count(*) OVER (PARTITION BY lang, source, b_coarse) AS c1,
       |    count(*) OVER (PARTITION BY lang, source) AS c2,
       |    count(*) OVER (PARTITION BY lang) AS c3
       |  FROM d)
       |SELECT doc_id,
       |  CAST(CASE WHEN c0 >= $KAnon THEN 0 WHEN c1 >= $KAnon THEN 1
       |    WHEN c2 >= $KAnon THEN 2 WHEN c3 >= $KAnon THEN 3
       |    ELSE 4 END AS BIGINT) AS level,
       |  CAST(CASE WHEN c0 >= $KAnon THEN c0 WHEN c1 >= $KAnon THEN c1
       |    WHEN c2 >= $KAnon THEN c2 WHEN c3 >= $KAnon THEN c3
       |    ELSE 0 END AS BIGINT) AS grp_n
       |FROM w ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val d = Tables.load(s, dir, "documents")
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"), col("lang"), col("source"),
        expr("greatest(n_chars, 0) div 100").as("b_fine"),
        expr("greatest(n_chars, 0) div 1000").as("b_coarse"))
    val w = d
      .withColumn("c0", count(lit(1)).over(
        Window.partitionBy("lang", "source", "b_fine")))
      .withColumn("c1", count(lit(1)).over(
        Window.partitionBy("lang", "source", "b_coarse")))
      .withColumn("c2", count(lit(1)).over(
        Window.partitionBy("lang", "source")))
      .withColumn("c3", count(lit(1)).over(Window.partitionBy("lang")))
    w.select(col("doc_id"),
      when(col("c0") >= KAnon, 0L).when(col("c1") >= KAnon, 1L)
        .when(col("c2") >= KAnon, 2L).when(col("c3") >= KAnon, 3L)
        .otherwise(4L).as("level"),
      when(col("c0") >= KAnon, col("c0"))
        .when(col("c1") >= KAnon, col("c1"))
        .when(col("c2") >= KAnon, col("c2"))
        .when(col("c3") >= KAnon, col("c3"))
        .otherwise(0L).cast("long").as("grp_n"))
      .orderBy("doc_id")
  }


  /** pseudonymization with referential integrity: peppered
    * SHA-256 tokens replace user ids; the audit proves the token
    * space preserves the join structure (one source id per token,
    * event counts preserved) — the reversible-only-with-pepper
    * de-identification step before sharing a corpus;
    */
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


  /** subject-access report: for a deterministic user sample
    * (user_id ≡ 7 mod 97), the per-user data footprint — event
    * count, distinct active days, first/last activity, purchase
    * cents, distinct event types — the GDPR Article-15 export
    * shape; one linear pass grouped by user, sample filter pushed
    * into the scan.
    */
  // ------------- q381: subject-access report

  private val q381 = Q(
    "q381_subject_access",
    """WITH e AS (
      |  SELECT user_id, ts, event_type,
      |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |  FROM events
      |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |    AND event_type IS NOT NULL
      |    AND (user_id % 97 + 97) % 97 = 7)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days,
      |  CAST(epoch_us(min(ts)) AS BIGINT) AS first_us,
      |  CAST(epoch_us(max(ts)) AS BIGINT) AS last_us,
      |  CAST(sum(CASE WHEN event_type = 'purchase'
      |    THEN coalesce(cents, 0) ELSE 0 END) AS BIGINT)
      |    AS purchase_cents,
      |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
      |FROM e GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull &&
        expr("(user_id % 97 + 97) % 97") === 7)
      .select(col("user_id"), col("ts"), col("event_type"),
        (col("value").cast(DecimalType(12, 2)) * 100).cast("long")
          .as("cents"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(to_date(col("ts"))).as("active_days"),
        min(unix_micros(col("ts"))).as("first_us"),
        max(unix_micros(col("ts"))).as("last_us"),
        sum(when(col("event_type") === "purchase",
          coalesce(col("cents"), lit(0L))).otherwise(0L))
          .as("purchase_cents"),
        countDistinct("event_type").as("n_types"))
      .select(col("user_id"), col("n_events").cast("long").as("n_events"),
        col("active_days").cast("long").as("active_days"),
        col("first_us").cast("long").as("first_us"),
        col("last_us").cast("long").as("last_us"),
        col("purchase_cents").cast("long").as("purchase_cents"),
        col("n_types").cast("long").as("n_types"))
      .orderBy("user_id")
  }


  def defs: Seq[Q] = Seq(q328, q335, q381)

}
