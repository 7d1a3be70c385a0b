package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-9 surfaces, part 33 — text drift and the subject-access
  * export:
  *
  *  - q380 trending terms: term frequencies in the doc_id-parity
  *    halves of the corpus (standing in for consecutive crawl
  *    snapshots), movers (±10% beyond parity) reported with exact
  *    cross-multiplied rise ratios — ratio_bp = fB·totalA·10⁴/(fA·totalB) — under a minimum
  *    support on both sides (below it, ratios are noise); the text
  *    twin of q368's embedding drift, and the screen that catches a
  *    crawler suddenly ingesting boilerplate. Two linear term counts,
  *    a ≤ #terms join, integers end to end;
  *  - q381 subject-access report: for a deterministic user sample
  *    (user_id ≡ 7 mod 97), the per-user data footprint — event
  *    count, distinct active days, first/last activity, purchase
  *    cents, distinct event types — the GDPR Article-15 export
  *    shape; one linear pass grouped by user, sample filter pushed
  *    into the scan.
  */
object ModernOps33 {

  private val MinSupport = 5

  private val q380 = Q(
    "q380_trending_terms",
    s"""WITH toks AS (
       |  SELECT doc_id % 2 AS half,
       |    unnest(string_split(lower(text), ' ')) AS term
       |  FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL),
       |tf AS (
       |  SELECT half, term, count(*) AS f FROM toks
       |  WHERE term <> '' GROUP BY 1, 2),
       |tot AS (
       |  SELECT
       |    sum(CASE WHEN half = 0 THEN f ELSE 0 END) AS ta,
       |    sum(CASE WHEN half = 1 THEN f ELSE 0 END) AS tb
       |  FROM tf),
       |wide AS (
       |  SELECT term,
       |    sum(CASE WHEN half = 0 THEN f ELSE 0 END) AS fa,
       |    sum(CASE WHEN half = 1 THEN f ELSE 0 END) AS fb
       |  FROM tf GROUP BY 1)
       |SELECT w.term, CAST(w.fa AS BIGINT) AS f_a,
       |  CAST(w.fb AS BIGINT) AS f_b,
       |  CAST(w.fb * t.ta * 10000 // (w.fa * t.tb) AS BIGINT)
       |    AS ratio_bp
       |FROM wide w CROSS JOIN tot t
       |WHERE w.fa >= $MinSupport AND w.fb >= $MinSupport
       |  AND (w.fb * t.ta * 10000 // (w.fa * t.tb) >= 11000
       |    OR w.fb * t.ta * 10000 // (w.fa * t.tb) <= 9090)
       |ORDER BY w.term""".stripMargin) { (s, dir) =>
    val tf = Tables.load(s, dir, "documents")
      .filter(col("text").isNotNull && col("doc_id").isNotNull)
      .select((col("doc_id") % 2).as("half"),
        explode(split(lower(col("text")), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("half", "term").agg(count(lit(1)).as("f"))
    val tot = tf.agg(
      sum(when(col("half") === 0, col("f")).otherwise(0L)).as("ta"),
      sum(when(col("half") === 1, col("f")).otherwise(0L)).as("tb"))
    val wide = tf.groupBy("term")
      .agg(sum(when(col("half") === 0, col("f")).otherwise(0L)).as("fa"),
        sum(when(col("half") === 1, col("f")).otherwise(0L)).as("fb"))
    wide.filter(col("fa") >= MinSupport && col("fb") >= MinSupport)
      .crossJoin(broadcast(tot))
      .withColumn("ratio_bp",
        expr("fb * ta * 10000 div (fa * tb)"))
      .filter(col("ratio_bp") >= 11000 || col("ratio_bp") <= 9090)
      .select(col("term"), col("fa").cast("long").as("f_a"),
        col("fb").cast("long").as("f_b"),
        col("ratio_bp").cast("long").as("ratio_bp"))
      .orderBy("term")
  }

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

  val defs: Seq[Q] = Seq(q380, q381)
}
