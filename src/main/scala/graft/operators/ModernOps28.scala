package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Round-9 surfaces, part 28 — embedding drift and the gains chart:
  *
  *  - q368 embedding drift: the corpus split into two halves by
  *    vec_id parity (standing in for "yesterday's batch vs today's"),
  *    per label the component-wise centroid compared between halves
  *    as the exact integer L1 numerator Σᵢ |sumAᵢ·nB − sumBᵢ·nA|
  *    (cross-multiplied mean difference — no division until the
  *    consumer wants it). Components quantize via explicit floor(
  *    double(v)·10⁴) clamped to ±10⁷ — CAST(float AS BIGINT) rounds in
  *    DuckDB but truncates in Spark, float-precision products floor
  *    differently than double ones, and unclamped adversarial ±1e30
  *    components overflow the integer chain: all three pinned here. The shuffle is
  *    (label × dim × half) partial sums — embedding-table-linear,
  *    the distribution-shift monitor for a feature store;
  *  - q369 gains/lift chart: vectors ranked by a model score (the
  *    first embedding component — floats used ONLY for ordering,
  *    never arithmetic), split into 10 equal-depth deciles by exact
  *    row-number allocation, per decile the positive count
  *    (label = 0), cumulative recall and lift in basis points — the
  *    decile-eval artifact next to q340's AUC and q330's calibration;
  *    ranking via ScalableRank, no single-partition window.
  */
object ModernOps28 {

  private val Dim = 64

  // ------------- q368: embedding drift between halves

  private val q368 = Q(
    "q368_embedding_drift",
    s"""WITH e AS (
       |  SELECT vec_id, label, embedding,
       |    vec_id % 2 AS half
       |  FROM embeddings
       |  WHERE vec_id IS NOT NULL AND label IS NOT NULL
       |    AND embedding IS NOT NULL AND len(embedding) = $Dim),
       |comp AS (
       |  SELECT e.label, e.half, t.i,
       |    sum(CAST(least(greatest(floor(
       |      CAST(e.embedding[CAST(t.i AS INT)] AS DOUBLE) * 10000),
       |      -10000000.0), 10000000.0) AS BIGINT)) AS s
       |  FROM e, (SELECT unnest(range(1, ${Dim + 1})) AS i) t
       |  GROUP BY 1, 2, 3),
       |n AS (
       |  SELECT label, half, count(*) AS n FROM e GROUP BY 1, 2),
       |wide AS (
       |  SELECT c.label, c.i,
       |    max(CASE WHEN c.half = 0 THEN c.s END) AS sa,
       |    max(CASE WHEN c.half = 1 THEN c.s END) AS sb
       |  FROM comp c GROUP BY 1, 2),
       |cnt AS (
       |  SELECT label,
       |    max(CASE WHEN half = 0 THEN n END) AS na,
       |    max(CASE WHEN half = 1 THEN n END) AS nb
       |  FROM n GROUP BY 1)
       |SELECT CAST(w.label AS BIGINT) AS label,
       |  CAST(c.na AS BIGINT) AS n_a, CAST(c.nb AS BIGINT) AS n_b,
       |  CAST(sum(abs(w.sa * c.nb - w.sb * c.na)) AS BIGINT) AS l1_num
       |FROM wide w JOIN cnt c ON c.label = w.label
       |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin) { (s, dir) =>
    val e = Tables.load(s, dir, "embeddings")
      .filter(col("vec_id").isNotNull && col("label").isNotNull &&
        col("embedding").isNotNull && size(col("embedding")) === Dim)
      .select(col("label").cast("long").as("label"),
        (col("vec_id") % 2).as("half"), col("embedding"))
    val comp = e
      .select(col("label"), col("half"),
        posexplode(col("embedding")).as(Seq("i0", "v")))
      .groupBy(col("label"), col("half"), (col("i0") + 1).as("i"))
      // float→double first (both engines must floor the SAME product),
      // then clamp: adversarial ±1e30 components would overflow the
      // exact integer chain; clamping is the quantizer's contract
      .agg(sum(least(greatest(
        floor(col("v").cast("double") * 10000), lit(-10000000.0)),
        lit(10000000.0)).cast("long")).as("s"))
    val n = e.groupBy("label", "half").agg(count(lit(1)).as("n"))
    val wide = comp.groupBy("label", "i")
      .agg(max(when(col("half") === 0, col("s"))).as("sa"),
        max(when(col("half") === 1, col("s"))).as("sb"))
    val cnt = n.groupBy("label")
      .agg(max(when(col("half") === 0, col("n"))).as("na"),
        max(when(col("half") === 1, col("n"))).as("nb"))
    wide.join(broadcast(cnt), "label")
      .groupBy(col("label"), col("na"), col("nb"))
      .agg(sum(abs(col("sa") * col("nb") - col("sb") * col("na")))
        .as("l1_num"))
      .select(col("label").cast("long").as("label"),
        col("na").cast("long").as("n_a"),
        col("nb").cast("long").as("n_b"),
        col("l1_num").cast("long").as("l1_num"))
      .orderBy("label")
  }

  // ------------- q369: gains / lift chart

  private val q369 = Q(
    "q369_gains_chart",
    """WITH v AS (
      |  SELECT vec_id, embedding[1] AS score,
      |    CASE WHEN label = 0 THEN 1 ELSE 0 END AS pos
      |  FROM embeddings
      |  WHERE vec_id IS NOT NULL AND label IS NOT NULL
      |    AND embedding IS NOT NULL),
      |r AS (
      |  SELECT pos,
      |    row_number() OVER (ORDER BY score DESC, vec_id) AS rk,
      |    count(*) OVER () AS n, sum(pos) OVER () AS tp
      |  FROM v),
      |d AS (
      |  SELECT (rk - 1) * 10 // n + 1 AS decile, pos, n, tp FROM r),
      |agg AS (
      |  SELECT decile, count(*) AS dn, sum(pos) AS dp,
      |    max(n) AS n, max(tp) AS tp
      |  FROM d GROUP BY 1)
      |SELECT CAST(decile AS BIGINT) AS decile,
      |  CAST(dn AS BIGINT) AS n, CAST(dp AS BIGINT) AS positives,
      |  CAST(sum(dp) OVER (ORDER BY decile) AS BIGINT) AS cum_positives,
      |  CAST(sum(dp) OVER (ORDER BY decile) * 10000 // tp AS BIGINT)
      |    AS recall_bp,
      |  CAST(dp * n * 10000 // (dn * tp) AS BIGINT) AS lift_bp
      |FROM agg ORDER BY decile""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val v = Tables.load(s, dir, "embeddings")
      .filter(col("vec_id").isNotNull && col("label").isNotNull &&
        col("embedding").isNotNull)
      .select(col("vec_id"), element_at(col("embedding"), 1).as("score"),
        when(col("label") === 0, 1L).otherwise(0L).as("pos"))
    // floats order the rank and nothing else — every emitted number
    // is an integer count or bp ratio
    val ranked = ScalableRank.withRank(
      v.withColumn("negScore", -col("score")), "rk",
      col("negScore"), col("vec_id"))
    val totals = ranked.agg(count(lit(1)).as("n"), sum("pos").as("tp"))
    val agg = ranked
      .crossJoin(broadcast(totals))
      .select(expr("(rk - 1) * 10 div n + 1").as("decile"), col("pos"),
        col("n"), col("tp"))
      .groupBy("decile")
      .agg(count(lit(1)).as("dn"), sum("pos").as("dp"),
        max("n").as("n"), max("tp").as("tp"))
    agg
      .withColumn("cum_positives", sum("dp").over(Window.orderBy("decile")))
      .select(col("decile").cast("long").as("decile"),
        col("dn").cast("long").as("n"),
        col("dp").cast("long").as("positives"),
        col("cum_positives").cast("long").as("cum_positives"),
        expr("cum_positives * 10000 div tp").cast("long").as("recall_bp"),
        expr("dp * n * 10000 div (dn * tp)").cast("long").as("lift_bp"))
      .orderBy("decile")
  }

  val defs: Seq[Q] = Seq(q368, q369)
}
