package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 surfaces, part 10 — index lifecycle and statistics:
  *
  *  - q316 IVF index persistence + incremental update: fit once on the
  *    initial corpus, PERSIST the index (centroids + postings), then a
  *    new vector batch is indexed by assigning against the FROZEN
  *    centroids and appending postings — the production ANN lifecycle
  *    (refitting on every ingest would re-shuffle the world; freezing
  *    trades a little recall for O(batch) updates);
  *  - q317 bootstrap confidence intervals per key: B deterministic
  *    resamples-with-replacement of each user's daily series (index
  *    chosen by an exact integer LCG, so both engines draw the same
  *    samples), CI = order statistics of the replica sums;
  *  - q318 histogram-based join cardinality estimation: fixed-width
  *    per-bucket (count, ndv) stats on both join sides, the classic
  *    `n1·n2 / max(d1,d2)` estimate vs the ACTUAL per-bucket join count
  *    — the optimizer-statistics surface, verifiable end to end.
  */
object ModernOps10 {

  // ------------- q316: IVF index persistence + incremental update

  private val IvfK = 8
  private val IvfIters = 3
  private val IvfProbes = 30

  /** The old/new split: vectors with 2·vec_id < max(vec_id) form the
    * initial corpus (scales with the table; the oracle spells the same
    * predicate). */
  private val IvfSplit = "2 * vec_id < (SELECT max(vec_id) FROM embeddings)"

  /** DuckDB: assign rows of `src` to the nearest centroid of `cents`
    * (same first-strict-min rule as the fit). */
  private def duckAssign(name: String, src: String, cents: String): String =
    s"""$name AS (
       |  SELECT vec_id, v, cell FROM (
       |    SELECT vec_id, v, cid AS cell,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
       |    FROM (SELECT s.vec_id, s.v, c.cid,
       |            list_sum(list_transform(range(1, 65),
       |              i -> (s.v[CAST(i AS INT)] - c.cv[CAST(i AS INT)])
       |                 * (s.v[CAST(i AS INT)] - c.cv[CAST(i AS INT)]))) AS d2
       |          FROM $src s CROSS JOIN $cents c)) WHERE rn = 1)""".stripMargin

  /** Fit on the OLD half, persist centroids + postings, index the NEW
    * batch against the frozen centroids (parquet APPEND — the index
    * files from the initial build are untouched), then search 30
    * probes through the LOADED index only. The oracle replays the
    * old-half fit bit-exactly, assigns the new batch to the same
    * frozen centroids, and probes the union. */
  private val q316 = Q(
    "q316_ivf_incremental_index",
    s"""${VectorOps.kmeansOracleCtes(k = IvfK, iters = IvfIters, dim = 64,
         srcWhere = s"WHERE $IvfSplit")},
       |allv AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |newv AS (SELECT * FROM allv WHERE NOT ($IvfSplit)),
       |${duckAssign("na", "newv", s"c$IvfIters")},
       |posts AS (
       |  SELECT vec_id, v, cell,
       |    sqrt(list_sum(list_transform(range(1, 65),
       |      i -> v[CAST(i AS INT)] * v[CAST(i AS INT)]))) AS nrm
       |  FROM (SELECT vec_id, v, cell FROM nn
       |        UNION ALL SELECT vec_id, v, cell FROM na))
       |SELECT qid, nid, cos_sim, rnk FROM (
       |  SELECT q.vec_id AS qid, n.vec_id AS nid,
       |    list_sum(list_transform(range(1, 65),
       |      i -> q.v[CAST(i AS INT)] * n.v[CAST(i AS INT)])) / (q.nrm * n.nrm)
       |      AS cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY list_sum(list_transform(range(1, 65),
       |        i -> q.v[CAST(i AS INT)] * n.v[CAST(i AS INT)])) / (q.nrm * n.nrm)
       |        DESC, n.vec_id) AS rnk
       |  FROM posts q JOIN posts n ON q.cell = n.cell AND q.vec_id <> n.vec_id
       |  WHERE q.vec_id < $IvfProbes) r
       |WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin) { (s, dir) =>
    val postsPath = java.nio.file.Files
      .createTempDirectory("graft_q316_posts").toString
    val all = VectorOps.vecs(s, dir)
    val maxId = all.agg(max("vec_id")).head().getLong(0)
    val old = all.filter(col("vec_id") * 2 < maxId)
    // initial build: fit + postings v1
    val cents = KMeansLite.fit(old, "vec_id", "v", k = IvfK, iters = IvfIters)
    KMeansLite.assign(old, "v", cents).select("vec_id", "cell")
      .write.mode("overwrite").parquet(postsPath)
    // a new batch lands: assign against the FROZEN centroids, APPEND
    KMeansLite.assign(all.filter(!(col("vec_id") * 2 < maxId)), "v", cents)
      .select("vec_id", "cell")
      .write.mode("append").parquet(postsPath)
    // search goes through the LOADED index only (no refit anywhere)
    val posts = s.read.parquet(postsPath)
      .join(all.select("vec_id", "v", "nrm"), "vec_id")
    val probes = posts.filter(col("vec_id") < IvfProbes)
      .select(col("vec_id").as("qid"), col("cell").as("qcell"),
        col("v").as("qv"), col("nrm").as("qnrm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id"))
    posts.join(probes,
        col("cell") === col("qcell") && col("vec_id") =!= col("qid"))
      .withColumn("cos_sim", expr("graft_dot(qv, v)") / (col("qnrm") * col("nrm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("qid"), col("vec_id").as("nid"), col("cos_sim"),
        col("rnk").cast("long").as("rnk"))
      .orderBy("qid", "rnk")
  }

  // ------------- q317: bootstrap confidence intervals per key

  private val BootB = 64

  /** Deterministic bootstrap: replica b draws element
    * ((b·48271 + i·16807) mod n) + 1 for i = 1..n — sampling WITH
    * replacement from the user's daily series, the same exact-integer
    * draw in both engines. The CI is [4th, 61st] order statistic of
    * the 64 replica sums (≈ 5th/95th percentile). Everything is a
    * per-key HOF over a key-bounded array: one hash aggregate, zero
    * extra shuffles, B×n integer ops per key. */
  private val q317 = Q(
    "q317_bootstrap_ci",
    s"""WITH daily AS (
       |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
       |    CAST(sum(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS x
       |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
       |  GROUP BY 1, 2),
       |ser AS (
       |  SELECT user_id, count(*) AS n, sum(x) AS total,
       |    list(x ORDER BY d) AS xs
       |  FROM daily GROUP BY user_id),
       |boot AS (
       |  SELECT user_id, n, total,
       |    list_sort(list_transform(range(1, $BootB + 1), b ->
       |      list_sum(list_transform(range(1, len(xs) + 1), i ->
       |        xs[CAST((b * 48271 + i * 16807) % len(xs) AS INT) + 1]))))
       |      AS sums
       |  FROM ser)
       |SELECT user_id, CAST(n AS BIGINT) AS n_days,
       |  CAST(total AS BIGINT) AS total,
       |  CAST(sums[4] AS BIGINT) AS ci_lo,
       |  CAST(sums[61] AS BIGINT) AS ci_hi
       |FROM boot ORDER BY user_id""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .filter(col("user_id").isNotNull && col("value").isNotNull)
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg((sum(col("value").cast("decimal(18,4)")) * 10000)
        .cast("long").as("x"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("x").as("total"),
        expr("transform(array_sort(collect_list(struct(d, x))), e -> e.x)")
          .as("xs"))
      .withColumn("sums", expr(
        s"""array_sort(transform(sequence(1, $BootB), b ->
           |  aggregate(sequence(1, size(xs)), CAST(0 AS BIGINT), (acc, i) ->
           |    acc + element_at(xs,
           |      CAST((b * 48271 + i * 16807) % size(xs) AS INT) + 1))))"""
          .stripMargin))
      .select(col("user_id"), col("n").cast("long").as("n_days"),
        col("total"),
        expr("element_at(sums, 4)").as("ci_lo"),
        expr("element_at(sums, 61)").as("ci_hi"))
      .orderBy("user_id")
  }

  // ------------- q318: histogram-based join cardinality estimation

  private val HistBuckets = 16

  /** Per-bucket (count, ndv) histograms on both sides of the
    * orders ⋈ customer key, the uniform-within-bucket estimate
    * `n1·n2 div max(d1,d2)`, and the ACTUAL per-bucket join count next
    * to it — the statistics pipeline every cost-based optimizer runs,
    * with its error measurable. Bucket width derives from max(custkey)
    * so the histogram scales with the corpus. Scope: non-negative
    * keys (floor- vs truncate-division diverges across engines on
    * negatives; both sides exclude them explicitly). Stats collection is one
    * aggregate per side; the actual count is the real join, only for
    * verification. */
  private val q318 = Q(
    "q318_histogram_join_estimate",
    s"""WITH w AS (
       |  SELECT greatest(CAST(max(c_custkey) AS BIGINT) // $HistBuckets, 1)
       |    AS bw FROM customer),
       |h1 AS (
       |  SELECT o_custkey // bw AS b, count(*) AS n1,
       |    count(DISTINCT o_custkey) AS d1
       |  FROM orders CROSS JOIN w
       |  WHERE o_custkey IS NOT NULL AND o_custkey >= 0 GROUP BY 1),
       |h2 AS (
       |  SELECT c_custkey // bw AS b, count(*) AS n2,
       |    count(DISTINCT c_custkey) AS d2
       |  FROM customer CROSS JOIN w
       |  WHERE c_custkey IS NOT NULL AND c_custkey >= 0 GROUP BY 1),
       |act AS (
       |  SELECT o.o_custkey // bw AS b, count(*) AS actual
       |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       |  CROSS JOIN w WHERE o.o_custkey >= 0 GROUP BY 1)
       |SELECT h1.b AS bucket,
       |  CAST(h1.n1 AS BIGINT) AS n_orders, CAST(h2.n2 AS BIGINT) AS n_cust,
       |  CAST(h1.n1 * h2.n2 // greatest(h1.d1, h2.d2) AS BIGINT) AS est_join,
       |  CAST(COALESCE(act.actual, 0) AS BIGINT) AS actual_join
       |FROM h1 JOIN h2 ON h1.b = h2.b
       |LEFT JOIN act ON act.b = h1.b
       |ORDER BY bucket""".stripMargin) { (s, dir) =>
    val customer = Tables.load(s, dir, "customer")
    val orders = Tables.load(s, dir, "orders")
    val bw = math.max(
      customer.agg(max(col("c_custkey")).cast("long")).head().getLong(0)
        / HistBuckets, 1L)
    val h1 = orders
      .filter(col("o_custkey").isNotNull && col("o_custkey") >= 0)
      .groupBy(expr(s"o_custkey div $bw").as("b"))
      .agg(count(lit(1)).as("n1"), countDistinct("o_custkey").as("d1"))
    val h2 = customer
      .filter(col("c_custkey").isNotNull && col("c_custkey") >= 0)
      .groupBy(expr(s"c_custkey div $bw").as("b"))
      .agg(count(lit(1)).as("n2"), countDistinct("c_custkey").as("d2"))
    val act = orders.filter(col("o_custkey") >= 0)
      .join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy(expr(s"o_custkey div $bw").as("b"))
      .agg(count(lit(1)).as("actual"))
    h1.join(h2, "b").join(act, Seq("b"), "left")
      .select(col("b").as("bucket"),
        col("n1").as("n_orders"), col("n2").as("n_cust"),
        expr("n1 * n2 div greatest(d1, d2)").as("est_join"),
        coalesce(col("actual"), lit(0L)).as("actual_join"))
      .orderBy("bucket")
  }

  val defs: Seq[Q] = Seq(q316, q317, q318)
}
