package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 surfaces, part 6 — two selection/forecast operators:
  *
  *  - q307 Maximal Marginal Relevance (Carbonell & Goldstein 1998):
  *    greedy diverse top-k over embeddings — each round picks the
  *    candidate maximizing λ·relevance − (1−λ)·max-similarity-to-
  *    selected. THE diversity-selection pass training-data curation
  *    runs after retrieval (dedup keeps one of near-identical docs;
  *    MMR keeps the most useful spread);
  *  - q308 Holt double-exponential smoothing per key: level+trend
  *    state folded over each user's daily series — the per-key
  *    forecast shape (anomaly baselines, capacity projection) that a
  *    window function cannot express (the recursion feeds back).
  *
  * Determinism notes: MMR rounds are argmax over IEEE doubles computed
  * by the same fold in both engines (the q47 precedent), ties broken
  * by vec_id; Holt folds exact-DECIMAL daily sums in series order with
  * the identical duplicated-subexpression arithmetic on both sides.
  */
object ModernOps6 {

  // ------------- q307: MMR diverse top-k

  private val MmrRounds = 10

  /** DuckDB dot product between the 64-dim double vectors of rows
    * `a` and `b` (same fold domain the Spark codegen uses). */
  private def duckDot(a: String, b: String): String =
    s"""list_sum(list_transform(range(1, 65),
       |  i -> $a.v[CAST(i AS INT)] * $b.v[CAST(i AS INT)]))""".stripMargin

  /** The unrolled greedy selection: s1 picks pure relevance, each
    * later round penalizes by the max cosine to everything selected so
    * far. Generated programmatically — one CTE triple per round. The
    * penalty is a candidate × selected JOIN + max (not a correlated
    * subquery: DuckDB's binder rejects outer lambda references). */
  private def mmrOracle: String = {
    val rounds = (2 to MmrRounds).map { r =>
      s"""c$r AS MATERIALIZED (
         |  SELECT r.vec_id, r.rel,
         |    max(${duckDot("r", "s")} / (r.nrm * s.nrm)) AS pen
         |  FROM rel r, p${r - 1} s
         |  WHERE r.vec_id NOT IN (SELECT vec_id FROM p${r - 1})
         |  GROUP BY 1, 2),
         |s$r AS MATERIALIZED (
         |  SELECT r2.vec_id, r2.v, r2.nrm, r2.rel, $r AS rnk,
         |    0.7 * c.rel - 0.3 * c.pen AS score
         |  FROM c$r c JOIN rel r2 ON r2.vec_id = c.vec_id
         |  ORDER BY score DESC, r2.vec_id LIMIT 1),
         |p$r AS MATERIALIZED (SELECT * FROM p${r - 1} UNION ALL SELECT * FROM s$r)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH base AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
       |    sqrt(list_sum(list_transform(embedding,
       |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
       |  FROM embeddings),
       |probe AS (SELECT v, nrm FROM base WHERE vec_id = 0 AND nrm > 0),
       |rel AS MATERIALIZED (
       |  SELECT b.vec_id, b.v, b.nrm,
       |    ${duckDot("b", "p")} / (b.nrm * p.nrm) AS rel
       |  FROM base b, probe p WHERE b.vec_id > 0 AND b.nrm > 0),
       |s1 AS MATERIALIZED (
       |  SELECT vec_id, v, nrm, rel, 1 AS rnk, 0.7 * rel AS score
       |  FROM rel ORDER BY score DESC, vec_id LIMIT 1),
       |p1 AS MATERIALIZED (SELECT * FROM s1),
       |$rounds
       |SELECT CAST(rnk AS INT) AS rnk, vec_id, rel, score
       |FROM p$MmrRounds ORDER BY rnk""".stripMargin
  }

  /** Greedy MMR: λ=0.7 relevance to the probe (vec_id 0) minus 0.3 ×
    * the max cosine to the already-selected set; 10 rounds.
    *
    * Scale shape: each round is ONE broadcast-free corpus scan — the
    * selected set lives in the plan as ≤10 literal vectors (the model
    * ships to the data, like q303's weights), relevance and penalties
    * are codegen dot products, and the argmax is a TakeOrdered(1).
    * Total cost k scans of the candidate set; nothing quadratic, no
    * driver-side candidate materialization (only the k winners ever
    * collect). The oracle unrolls the identical greedy rounds. */
  private val q307 = Q("q307_mmr_diverse_topk", mmrOracle) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    val base = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
    val probe = base.filter(col("vec_id") === 0 && col("nrm") > 0)
      .select("v", "nrm").head()
    val pv = probe.getSeq[Double](0)
    val pn = probe.getDouble(1)
    val rel = base.filter(col("vec_id") > 0 && col("nrm") > 0)
      .withColumn("pv", typedLit(pv))
      .withColumn("rel", expr("graft_dot(v, pv)") / (col("nrm") * lit(pn)))
      .select("vec_id", "v", "nrm", "rel")
      .localCheckpoint() // reused every round; holds (id, vec, rel)
    var selected = Vector.empty[(Long, Seq[Double], Double, Double, Double)]
    for (r <- 1 to MmrRounds) {
      var scored = rel
      selected.zipWithIndex.foreach { case ((_, sv, sn, _, _), i) =>
        scored = scored
          .withColumn(s"sv_$i", typedLit(sv))
          .withColumn(s"pen_$i",
            expr(s"graft_dot(v, sv_$i)") / (col("nrm") * lit(sn)))
      }
      scored =
        if (selected.isEmpty) scored.withColumn("score", expr("0.7 * rel"))
        else {
          val pens = selected.indices.map(i => col(s"pen_$i"))
          scored
            .withColumn("pen",
              if (pens.size == 1) pens.head else greatest(pens: _*))
            .withColumn("score", expr("0.7 * rel - 0.3 * pen"))
        }
      val pick = scored
        .filter(!col("vec_id").isin(selected.map(_._1): _*))
        .orderBy(col("score").desc, col("vec_id"))
        .select("vec_id", "v", "nrm", "rel", "score")
        .head()
      selected :+= ((pick.getLong(0), pick.getSeq[Double](1),
        pick.getDouble(2), pick.getDouble(3), pick.getDouble(4)))
    }
    import s.implicits._
    selected.zipWithIndex
      .map { case ((id, _, _, rl, sc), i) => (i + 1, id, rl, sc) }
      .toDF("rnk", "vec_id", "rel", "score")
      .orderBy("rnk")
  }

  // ------------- q308: Holt double-exponential smoothing per key

  /** Per-user level+trend smoothing (α = β = 0.5 — exact binary
    * fractions keep the IEEE arithmetic clean): daily revenue series
    * (exact DECIMAL sums, cast to DOUBLE once), folded in day order
    * with l' = 0.5x + 0.5(l+b), b' = 0.5(l'−l) + 0.5b, initialized
    * l=x₀, b=0. The fold is a per-key sequential recursion — per-key
    * state is 2 doubles and the series is key-bounded (days), so the
    * shuffle is one hash aggregate however wide the corpus. A window
    * function cannot express it (each step feeds back); the HOF fold
    * can, and the DuckDB list_reduce replays it term-for-term. */
  private val q308 = Q(
    "q308_holt_smoothing",
    """WITH daily AS (
      |  SELECT user_id, date_trunc('day', ts) AS d,
      |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS x
      |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
      |  GROUP BY 1, 2),
      |series AS (
      |  SELECT user_id, count(*) AS n_days,
      |    list_reduce(list_transform(list(x ORDER BY d), v -> [v, 0.0]),
      |      (acc, e) -> [0.5 * e[1] + 0.5 * (acc[1] + acc[2]),
      |        0.5 * ((0.5 * e[1] + 0.5 * (acc[1] + acc[2])) - acc[1])
      |          + 0.5 * acc[2]]) AS lb
      |  FROM daily GROUP BY user_id)
      |SELECT user_id, CAST(n_days AS BIGINT) AS n_days,
      |  lb[1] AS level, lb[2] AS trend, lb[1] + lb[2] AS forecast
      |FROM series ORDER BY user_id""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .filter(col("user_id").isNotNull && col("value").isNotNull)
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(sum(col("value").cast("decimal(18,4)")).cast("double").as("x"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_days"),
        expr("""aggregate(
          |  slice(transform(array_sort(collect_list(struct(d, x))),
          |          e -> e.x), 2, size(collect_list(struct(d, x)))),
          |  struct(element_at(transform(array_sort(collect_list(struct(d, x))),
          |          e -> e.x), 1) AS l, CAST(0.0 AS DOUBLE) AS b),
          |  (acc, v) -> struct(
          |    0.5 * v + 0.5 * (acc.l + acc.b) AS l,
          |    0.5 * ((0.5 * v + 0.5 * (acc.l + acc.b)) - acc.l)
          |      + 0.5 * acc.b AS b))""".stripMargin).as("lb"))
      .select(col("user_id"), col("n_days"),
        col("lb.l").as("level"), col("lb.b").as("trend"),
        expr("lb.l + lb.b").as("forecast"))
      .orderBy("user_id")
  }

  val defs: Seq[Q] = Seq(q307, q308)
}
