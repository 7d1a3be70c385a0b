package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Round-9 surfaces, part 14 — privacy auditing, record consolidation,
  * and monotone calibration:
  *
  *  - q328 k-anonymity generalization ladder: every doc's
  *    quasi-identifier tuple (lang, source, size bucket) is checked
  *    against k=3 at four generalization levels (fine bucket → coarse
  *    bucket → drop size → lang only) and labeled with the minimal
  *    level that reaches k — the privacy audit a training corpus runs
  *    before release, counts-only and NULL-group-consistent (window
  *    counts, not joins, so NULL quasi-identifiers stay grouped);
  *  - q329 golden-record survivorship: per user, field-level merge of
  *    the event history — latest props by a total (ts, event_id) order
  *    packed into a fixed-width digit key (engine-safe argmax), first/
  *    last seen, exact decimal spend — the consolidation step after
  *    entity resolution (q250) clusters records;
  *  - q330 isotonic calibration via the PAVA minimax closed form:
  *    fit(i) = max_{j≤i} min_{k≥i} avg(y, bins j..k) over B=16 score
  *    bins per group — O(B³) on bin aggregates (never on rows), giving
  *    the monotone probability calibration a quality-score model needs;
  *    bin averages are single IEEE divisions of exact integer sums, so
  *    both engines compute bit-identical doubles.
  */
object ModernOps14 {

  // ------------- q328: k-anonymity generalization ladder

  private val KAnon = 3

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

  // ------------- q329: golden-record survivorship

  /** Total recency order as a fixed-width digit string (epoch micros
    * then event id, both non-negative here) — lexicographic max equals
    * the (ts, event_id) max in every engine, with no composite-argmax
    * or tie-semantics dependence. */
  private val q329 = Q(
    "q329_golden_record",
    """WITH e AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    coalesce(props, '') AS props, value,
      |    lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
      |      || lpad(CAST(event_id AS VARCHAR), 12, '0') AS rk
      |  FROM events
      |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |    AND event_id IS NOT NULL AND event_id >= 0)
      |SELECT user_id,
      |  arg_max(props, rk) AS last_props,
      |  CAST(min(epoch_us(ts)) AS BIGINT) AS first_us,
      |  CAST(max(epoch_us(ts)) AS BIGINT) AS last_us,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN
      |      CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) END), 0)
      |    AS BIGINT) AS spend_cents,
      |  CAST(coalesce(max(CASE WHEN event_type = 'purchase'
      |      THEN epoch_us(ts) END), -1) AS BIGINT) AS last_purchase_us
      |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    val e = Tables.load(s, dir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_id").isNotNull && col("event_id") >= 0)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), coalesce(col("props"), lit("")).as("props"),
        col("value"),
        concat(lpad(expr("CAST(unix_micros(ts) AS STRING)"), 20, "0"),
          lpad(col("event_id").cast("string"), 12, "0")).as("rk"))
    e.groupBy("user_id")
      .agg(
        expr("max_by(props, rk)").as("last_props"),
        min(expr("unix_micros(ts)")).cast("long").as("first_us"),
        max(expr("unix_micros(ts)")).cast("long").as("last_us"),
        count(lit(1)).as("n_events"),
        coalesce(sum(when(col("event_type") === "purchase",
          (col("value").cast(DecimalType(12, 2)) * 100).cast("long"))),
          lit(0L)).cast("long").as("spend_cents"),
        coalesce(max(when(col("event_type") === "purchase",
          expr("unix_micros(ts)"))), lit(-1L)).cast("long")
          .as("last_purchase_us"))
      .orderBy("user_id")
  }

  // ------------- q330: isotonic calibration (PAVA closed form)

  private val IsoBins = 16

  /** Score = event value binned into B equal-width buckets; label =
    * purchase indicator. The minimax runs on per-bin (sum, cnt)
    * aggregates — B² segment averages, B³ candidate triples — all
    * broadcast-sized regardless of row count. */
  private val q330 = Q(
    "q330_isotonic_calibration",
    s"""WITH e AS (
       |  SELECT value AS v,
       |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
       |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
       |mm AS (SELECT min(v) AS mn, max(v) AS mx FROM e),
       |binned AS (
       |  SELECT CASE WHEN mx > mn THEN least($IsoBins - 1,
       |      CAST(floor((v - mn) * $IsoBins / (mx - mn)) AS BIGINT))
       |    ELSE 0 END AS bin, y
       |  FROM e, mm),
       |bs AS (
       |  SELECT bin, count(*) AS c, sum(y) AS s FROM binned GROUP BY 1),
       |seg AS (
       |  SELECT a.bin AS j, b.bin AS k,
       |    CAST(sum(i.s) AS DOUBLE) / CAST(sum(i.c) AS DOUBLE) AS a
       |  FROM bs a JOIN bs b ON a.bin <= b.bin
       |  JOIN bs i ON i.bin BETWEEN a.bin AND b.bin
       |  GROUP BY 1, 2),
       |inner_min AS (
       |  SELECT t.bin AS i, seg.j, min(seg.a) AS m
       |  FROM bs t JOIN seg ON seg.j <= t.bin AND seg.k >= t.bin
       |  GROUP BY 1, 2),
       |fit AS (SELECT i, max(m) AS fit FROM inner_min GROUP BY 1)
       |SELECT f.i AS bin, CAST(b.c AS BIGINT) AS n,
       |  CAST(b.s AS BIGINT) AS n_pos,
       |  CAST(b.s AS DOUBLE) / CAST(b.c AS DOUBLE) AS raw_rate,
       |  f.fit AS iso_rate
       |FROM fit f JOIN bs b ON b.bin = f.i
       |ORDER BY bin""".stripMargin) { (s, dir) =>
    val e = Tables.load(s, dir, "events")
      .filter(col("value").isNotNull && col("event_type").isNotNull)
      .select(col("value").as("v"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    val mm = e.agg(min("v").as("mn"), max("v").as("mx"))
    val binned = e.crossJoin(broadcast(mm))
      .select(
        when(col("mx") > col("mn"),
          least(lit(IsoBins - 1),
            floor((col("v") - col("mn")) * IsoBins
              / (col("mx") - col("mn"))).cast("long")))
          .otherwise(0L).as("bin"),
        col("y"))
    val bs = binned.groupBy("bin")
      .agg(count(lit(1)).as("c"), sum("y").as("s"))
      .localCheckpoint() // B rows; every derived table below is tiny
    val seg = bs.as("a")
      .join(bs.as("b"), col("a.bin") <= col("b.bin"))
      .join(bs.as("i"),
        col("i.bin").between(col("a.bin"), col("b.bin")))
      .groupBy(col("a.bin").as("j"), col("b.bin").as("k"))
      .agg((sum("i.s").cast("double") / sum("i.c").cast("double"))
        .as("a"))
    val innerMin = bs.as("t")
      .join(seg, col("j") <= col("t.bin") && col("k") >= col("t.bin"))
      .groupBy(col("t.bin").as("i"), col("j"))
      .agg(min("a").as("m"))
    val fit = innerMin.groupBy("i").agg(max("m").as("fit"))
    fit.as("f").join(bs.as("b"), col("b.bin") === col("f.i"))
      .select(col("f.i").as("bin"), col("b.c").cast("long").as("n"),
        col("b.s").cast("long").as("n_pos"),
        (col("b.s").cast("double") / col("b.c").cast("double"))
          .as("raw_rate"),
        col("f.fit").as("iso_rate"))
      .orderBy("bin")
  }

  val defs: Seq[Q] = Seq(q328, q329, q330)
}
