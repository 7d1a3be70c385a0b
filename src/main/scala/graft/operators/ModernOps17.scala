package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Round-9 surfaces, part 17 — feature hygiene, weighted order
  * statistics, and exact ranking metrics:
  *
  *  - q338 long-tail category collapse: keep the top-K vocabulary by
  *    global frequency, fold everything else into `__other__` — the
  *    cardinality-capping step before one-hot/target encoding, exact
  *    counts only;
  *  - q339 weighted median / weighted p90 per group: smallest value
  *    whose cumulative weight clears the quantile threshold, computed
  *    on the per-(group, value) aggregate (the window runs over
  *    distinct values, not rows); weights pass through an explicit
  *    floor() because CAST(DOUBLE AS BIGINT) rounds in some engines
  *    and truncates in others;
  *  - q340 exact AUC via the tie-corrected Mann–Whitney U: doubled
  *    average ranks (2·cnt_less + cnt_eq + 1) keep everything integer,
  *    per-source breakdown plus TOTAL, degenerate scopes (single-class)
  *    report -1;
  *  - q341 Gini concentration of customer spend: the rank-weighted
  *    closed form (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) in basis points,
  *    ranks from ScalableRank (no global window); intermediate products
  *    stay under 2^63 for n·max(x) < 9·10^18 — holds through 100x with
  *    ~10^7-cent spends.
  */
object ModernOps17 {

  // ------------- q338: long-tail category collapse

  private val TopK = 8

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

  // ------------- q340: exact AUC (tie-corrected Mann–Whitney)

  /** Doubled average rank of a score-tie class = 2·cnt_less + cnt_eq
    * + 1 per member; summed over positives this gives 2·R⁺ exactly. */
  private val q340 = Q(
    "q340_exact_auc",
    """WITH d AS (
      |  SELECT source, n_chars AS score,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents
      |  WHERE doc_id IS NOT NULL AND source IS NOT NULL
      |    AND lang IS NOT NULL AND n_chars IS NOT NULL),
      |u AS (
      |  SELECT 'TOTAL' AS scope, score, y FROM d
      |  UNION ALL SELECT source, score, y FROM d),
      |bys AS (
      |  SELECT scope, score, count(*) AS n, sum(y) AS npos
      |  FROM u GROUP BY 1, 2),
      |cw AS (
      |  SELECT scope, score, n, npos,
      |    sum(n) OVER (PARTITION BY scope ORDER BY score) - n AS less
      |  FROM bys),
      |agg AS (
      |  SELECT scope,
      |    sum(npos) AS np, sum(n) - sum(npos) AS nn,
      |    sum(npos * (2 * less + n + 1)) AS r2
      |  FROM cw GROUP BY 1)
      |SELECT scope, CAST(np AS BIGINT) AS npos, CAST(nn AS BIGINT) AS nneg,
      |  CAST(CASE WHEN np > 0 AND nn > 0
      |    THEN (r2 - np * (np + 1)) * 10000 // (2 * np * nn)
      |    ELSE -1 END AS BIGINT) AS auc_bp
      |FROM agg ORDER BY scope""".stripMargin) { (s, dir) =>
    val d = Tables.load(s, dir, "documents")
      .filter(col("doc_id").isNotNull && col("source").isNotNull &&
        col("lang").isNotNull && col("n_chars").isNotNull)
      .select(col("source"), col("n_chars").as("score"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
    val u = d.select(lit("TOTAL").as("scope"), col("score"), col("y"))
      .unionByName(d.select(col("source").as("scope"), col("score"),
        col("y")))
    val bys = u.groupBy("scope", "score")
      .agg(count(lit(1)).as("n"), sum("y").as("npos"))
    val cw = bys.withColumn("less",
      sum("n").over(Window.partitionBy("scope").orderBy("score"))
        - col("n"))
    cw.groupBy("scope")
      .agg(sum("npos").as("np"),
        (sum("n") - sum("npos")).as("nn"),
        sum(col("npos") * (col("less") * 2 + col("n") + 1)).as("r2"))
      .select(col("scope"), col("np").cast("long").as("npos"),
        col("nn").cast("long").as("nneg"),
        when(col("np") > 0 && col("nn") > 0,
          expr("(r2 - np * (np + 1)) * 10000 div (2 * np * nn)"))
          .otherwise(-1L).cast("long").as("auc_bp"))
      .orderBy("scope")
  }

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

  val defs: Seq[Q] = Seq(q338, q339, q340, q341)
}
