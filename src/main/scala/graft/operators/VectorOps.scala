package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (Array[Float], 64-dim).
  *
  * Cross-engine determinism: floats are cast to DOUBLE *before* any
  * multiply (float*float rounds differently than double*double), and dot
  * products are sequential left folds — Spark `aggregate` and DuckDB
  * `list_sum` both fold in array order, so results are bit-identical.
  *
  * Scale design (100 TB):
  *  - q47 brute-force top-k is O(|Q| * N) with a *bounded* query set —
  *    the pattern for "retrieve neighbors of this batch", not all-pairs;
  *  - q48 exact all-pairs is the correctness baseline for q49;
  *  - q49 is the scale path: random-hyperplane signatures bucket vectors
  *    (equi-join on (band, bits)), exact cosine verifies candidates only.
  */
object VectorOps {

  /** vec_id + embedding as double[] + precomputed L2 norm. Dot products go
    * through the codegen'd [[graft.functions.DotProduct]] expression — the
    * interpreted `aggregate(zip_with(...))` HOF was the bench bottleneck. */
  private[operators] def vecs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
  }

  private val dotExpr = "graft_dot(qv, v)"

  /** DuckDB-side cosine between embeddings of rows a and b. */
  private[operators] def duckCos(a: String, b: String): String =
    s"""(list_sum(list_transform(range(1, len($a.embedding) + 1),
       |   i -> CAST($a.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE)))
       | / (sqrt(list_sum(list_transform(range(1, len($a.embedding) + 1),
       |      i -> CAST($a.embedding[i] AS DOUBLE) * CAST($a.embedding[i] AS DOUBLE))))
       |  * sqrt(list_sum(list_transform(range(1, len($b.embedding) + 1),
       |      i -> CAST($b.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE))))))""".stripMargin

  // --------------------------------------------- brute-force cosine top-k

  private val q47 = Q(
    "q47_cosine_topk",
    s"""SELECT q.vec_id AS qid, n.vec_id AS nid,
       |  ${duckCos("q", "n")} AS cos_sim,
       |  rnk
       |FROM (
       |  SELECT q.vec_id AS qv, n.vec_id AS nv,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${duckCos("q", "n")} DESC, n.vec_id) AS rnk
       |  FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
       |  WHERE q.vec_id < 20) r
       |JOIN embeddings q ON q.vec_id = r.qv
       |JOIN embeddings n ON n.vec_id = r.nv
       |WHERE rnk <= 5
       |ORDER BY qid, rnk""".stripMargin) { (s, dir) =>
    val all = vecs(s, dir)
    val queries = all.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    // Bounded query batch x full corpus: broadcast the queries so the
    // corpus scan streams once with no shuffle; top-k via per-query window.
    val scored = all.join(broadcast(queries), col("vec_id") =!= col("qid"))
      .withColumn("cos_sim", expr(dotExpr) / (col("qnrm") * col("nrm")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("qid"), col("vec_id").as("nid"), col("cos_sim"),
        col("rnk").cast("long").as("rnk"))
      .orderBy("qid", "rnk")
  }

  // ------------------------------------ exact all-pairs top-N similar

  /** All ordered pairs (d1 < d2) with cosine, via BLOCK-PARTITIONED
    * pairing: vectors get a block id g ∈ [0,B); the join key is the
    * ORDERED block pair (block(d1), block(d2)), with each side
    * map-side-replicated ×B over the other side's block — so every
    * (d1 < d2) pair meets on exactly one of B² equi-join keys and the
    * n²/2 comparisons split into B² balanced shuffle tasks of |n/B|²
    * work each. No BroadcastNestedLoopJoin, no single-task cartesian:
    * this is the exact-all-pairs shape that survives a 100× scale-up —
    * B RISES WITH n (one cheap count) to hold per-task work ≈ (n/B)²
    * constant; replication is ×B rows but ×1 bytes shuffled per
    * comparison performed. Results are B-independent (B only partitions
    * the pair space), so the oracle never sees it. */
  private[operators] def blockPairs(s: SparkSession, all: DataFrame, B0: Int = 0): DataFrame = {
    import s.implicits._
    val B = if (B0 > 0) B0 else {
      // ~4k vectors per block → ≤16M comparisons per task; cap keeps the
      // ×B row replication bounded.
      val n = all.count()
      math.min(128, math.max(8, math.ceil(n / 4000.0).toInt))
    }
    val blockIds = broadcast((0 until B).toDF("other"))
    val a = all.select(col("vec_id").as("d1"), col("v").as("qv"), col("nrm").as("n1"))
      .join(blockIds, expr("true"))
      .select(col("d1"), col("qv"), col("n1"),
        pmod(col("d1"), lit(B)).cast("int").as("ki"), col("other").as("kj"))
    val b = all.select(col("vec_id").as("d2"), col("v").as("v"), col("nrm").as("n2"))
      .join(blockIds, expr("true"))
      .select(col("d2"), col("v"), col("n2"),
        col("other").as("ki"), pmod(col("d2"), lit(B)).cast("int").as("kj"))
    a.join(b, Seq("ki", "kj"))
      .filter(col("d1") < col("d2"))
      .withColumn("cos_sim", expr(dotExpr) / (col("n1") * col("n2")))
      .select("d1", "d2", "cos_sim")
  }

  private val q48 = Q(
    "q48_embedding_top_pairs",
    s"""SELECT a.vec_id AS d1, b.vec_id AS d2, ${duckCos("a", "b")} AS cos_sim
       |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |ORDER BY cos_sim DESC, d1, d2 LIMIT 100""".stripMargin) { (s, dir) =>
    // Exact all-pairs similarity, global top-100 over the block-pair
    // equi-join; top-N is TakeOrdered — no full sort materialization.
    blockPairs(s, vecs(s, dir))
      .orderBy(col("cos_sim").desc, col("d1"), col("d2"))
      .limit(100)
  }

  // ------------------------------------- embedding-cosine near-dup dedup

  /** Near-duplicate threshold. The synthetic embeddings corpus has no
    * true near-dups (max pairwise cosine ≈ 0.51 at sf0.01), so the
    * threshold sits inside the observed similarity tail to keep the
    * drop set non-trivial at every SF; real corpora would run 0.95+. */
  val NearDupTau = 0.35

  // ------------------------- int8 embedding quantization (storage path)

  private val q147 = Q(
    "q147_embedding_quantize",
    """WITH v AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings WHERE vec_id < 100),
      |s AS (
      |  SELECT vec_id, v,
      |    CASE WHEN m = 0 THEN 1.0 ELSE m / 127.0 END AS scale
      |  FROM (SELECT vec_id, v,
      |          list_max(list_transform(v, x -> abs(x))) AS m FROM v)),
      |d AS (
      |  SELECT vec_id, scale,
      |    list_max(list_transform(range(1, 65),
      |      i -> abs(v[i] - floor(v[i] / scale + 0.5) * scale))) AS max_abs_err,
      |    list_sum(list_transform(range(1, 65),
      |      i -> v[i] * (floor(v[i] / scale + 0.5) * scale))) AS dot,
      |    list_sum(list_transform(range(1, 65),
      |      i -> v[i] * v[i])) AS n2v,
      |    list_sum(list_transform(range(1, 65),
      |      i -> (floor(v[i] / scale + 0.5) * scale) *
      |           (floor(v[i] / scale + 0.5) * scale))) AS n2d
      |  FROM s)
      |SELECT vec_id, scale, max_abs_err,
      |  CASE WHEN n2v = 0 OR n2d = 0 THEN NULL
      |       ELSE dot / (sqrt(n2v) * sqrt(n2d)) END AS cos_sim
      |FROM d ORDER BY vec_id""".stripMargin) { (s, dir) =>
    // Embedding storage at 100 TB is the int8 path: symmetric per-vector
    // quantization (scale = max|v|/127) cuts the corpus 4x; what matters
    // is that the ANN ranking survives, so the op emits the quantization
    // error AND the original-vs-dequantized cosine per vector. One pass
    // per row through the codegen-fallback [[graft.functions.QuantStats]]
    // (primitive loop; no interpreted HOF re-evaluation), no shuffle.
    vecs(s, dir).filter(col("vec_id") < 100)
      .select(col("vec_id"), expr("graft_quant_stats(v)").as("qs"))
      .select(col("vec_id"), col("qs.scale").as("scale"),
        col("qs.max_abs_err").as("max_abs_err"),
        col("qs.cos_sim").as("cos_sim"))
      .orderBy("vec_id")
  }

  private val q123 = Q(
    "q123_embedding_neardup",
    s"""SELECT b.vec_id AS vec_id, min(a.vec_id) AS dup_of
       |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |WHERE ${duckCos("a", "b")} >= $NearDupTau
       |GROUP BY b.vec_id ORDER BY vec_id""".stripMargin) { (s, dir) =>
    // Embedding-cosine near-dup dedup (single-pass, leader = lowest id):
    // a vector is a duplicate iff ANY lower-id vector is within the
    // cosine threshold; `dup_of` is the lowest such id. Exact via the
    // same block-pair equi-join as q48 (this is the declared-oracle
    // baseline; at 100 TB the production path prefilters candidates with
    // LSH buckets, q49-style, before the exact verify). The threshold
    // compare and the min-aggregation are order-independent, so the
    // result is bit-identical across engines.
    blockPairs(s, vecs(s, dir))
      .filter(col("cos_sim") >= NearDupTau)
      .groupBy(col("d2").as("vec_id"))
      .agg(min(col("d1")).as("dup_of"))
      .orderBy("vec_id")
  }

  // ------------------------------------- IVF-style bucketed ANN probe

  private val q49 = Q(
    "q49_embedding_ann_ivf",
    s"""SELECT qid, nid, cos_sim, rnk FROM (
       |  SELECT q.vec_id AS qid, n.vec_id AS nid, ${duckCos("q", "n")} AS cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${duckCos("q", "n")} DESC, n.vec_id) AS rnk
       |  FROM embeddings q JOIN embeddings n
       |    ON q.label = n.label AND q.vec_id <> n.vec_id
       |  WHERE q.vec_id < 50) r
       |WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin) { (s, dir) =>
    // IVF-style ANN: `label` is the coarse cell assignment (in a full IVF
    // build it comes from k-means over a sample); the probe searches only
    // the query's own cell — an equi-join on the cell id instead of an n²
    // cross join. That equi-join is the 100 TB pattern: both sides
    // shuffle-partition by cell, each cell is scanned independently.
    val all = vecs(s, dir)
    val queries = all.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("v").as("qv"), col("nrm").as("qnrm"))
    val scored = all.join(queries,
        col("label") === col("qlabel") && col("vec_id") =!= col("qid"))
      .withColumn("cos_sim", expr(dotExpr) / (col("qnrm") * col("nrm")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("qid"), col("vec_id").as("nid"), col("cos_sim"),
        col("rnk").cast("long").as("rnk"))
      .orderBy("qid", "rnk")
  }

  // ----------------------------- IVF with a real centroid build (k-means)

  /** DuckDB replay of [[KMeansLite]]: the fit is fully deterministic
    * (lowest-id init, fixed iteration count, first-strict-min argmin,
    * 2^30-quantized integer-sum means), so `iters` unrolled
    * assign+re-center rounds reproduce the Spark centroids BIT-EXACTLY
    * in SQL — every FP step (one multiply, round-half-away, integer sum,
    * one multiply + divide) is engine-identical. */
  private[operators] def kmeansOracleCtes(k: Int, iters: Int, dim: Int,
      srcWhere: String = ""): String = {
    val S = "1073741824.0" // KMeansLite.MeanScale
    val C = "4294967296.0" // KMeansLite.QClamp — overflow guard, see there
    def d2(v: String, cv: String) =
      s"""list_sum(list_transform(range(1, ${dim + 1}),
         |      i -> ($v[CAST(i AS INT)] - $cv[CAST(i AS INT)])
         |         * ($v[CAST(i AS INT)] - $cv[CAST(i AS INT)])))""".stripMargin
    // assign to the nearest centroid of `cents`: first strict minimum ==
    // lowest cid among minima == ORDER BY (d2, cid).
    def assignCte(name: String, cents: String) =
      s"""$name AS (
         |  SELECT vec_id, v, cell FROM (
         |    SELECT vec_id, v, cid AS cell,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |    FROM (SELECT vec_id, v, cid, ${d2("v", "cv")} AS d2
         |          FROM vv CROSS JOIN $cents)) WHERE rn = 1)""".stripMargin
    // re-center: per-(cell, dim) mean of 2^30-quantized values; cells
    // with no members keep the previous centroid.
    def centerCte(name: String, assigned: String, prev: String) =
      s"""$name AS (
         |  SELECT p.cid, COALESCE(u.cv, p.cv) AS cv
         |  FROM $prev p LEFT JOIN (
         |    SELECT cell AS cid, list(m ORDER BY pos) AS cv FROM (
         |      SELECT cell, pos,
         |        CAST(SUM(q) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * $S) AS m
         |      FROM (SELECT cell, i AS pos,
         |              CAST(round(least(greatest(v[CAST(i AS INT)], -$C), $C) * $S)
         |                   AS BIGINT) AS q
         |            FROM $assigned CROSS JOIN range(1, ${dim + 1}) t(i))
         |      GROUP BY cell, pos) GROUP BY cell) u ON p.cid = u.cid)""".stripMargin
    val iterCtes = (1 to iters).map { t =>
      assignCte(s"a$t", s"c${t - 1}") + ",\n" +
        centerCte(s"c$t", s"a$t", s"c${t - 1}")
    }.mkString(",\n")
    s"""WITH vv AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings $srcWhere),
       |c0 AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, v AS cv
       |  FROM (SELECT vec_id, v FROM vv ORDER BY vec_id LIMIT $k)),
       |$iterCtes,
       |af AS (
       |  SELECT vec_id, v, cell FROM (
       |    SELECT vec_id, v, cid AS cell,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
       |    FROM (SELECT vec_id, v, cid, ${d2("v", "cv")} AS d2
       |          FROM vv CROSS JOIN c$iters)) WHERE rn = 1),
       |nn AS (
       |  SELECT vec_id, v, cell,
       |    sqrt(list_sum(list_transform(range(1, ${dim + 1}),
       |      i -> v[CAST(i AS INT)] * v[CAST(i AS INT)]))) AS nrm
       |  FROM af)""".stripMargin
  }

  /** q49 with the coarse cells LEARNED instead of taken from `label`:
    * [[KMeansLite]] fits k=8 centroids, every vector is assigned to its
    * nearest centroid in one codegen map-side pass, and the probe
    * searches only the query's own cell. The oracle replays the
    * deterministic fit as $iters unrolled SQL rounds (bit-exact, see
    * [[kmeansOracleCtes]]) and the probe as a cell equi-join. */
  private val q115 = Q(
    "q115_ivf_kmeans",
    s"""${kmeansOracleCtes(k = 8, iters = 3, dim = 64)}
       |SELECT qid, nid, cos_sim, rnk FROM (
       |  SELECT q.vec_id AS qid, n.vec_id AS nid,
       |    list_sum(list_transform(range(1, 65),
       |      i -> q.v[CAST(i AS INT)] * n.v[CAST(i AS INT)])) / (q.nrm * n.nrm) AS cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY list_sum(list_transform(range(1, 65),
       |        i -> q.v[CAST(i AS INT)] * n.v[CAST(i AS INT)])) / (q.nrm * n.nrm) DESC,
       |        n.vec_id) AS rnk
       |  FROM nn q JOIN nn n ON q.cell = n.cell AND q.vec_id <> n.vec_id
       |  WHERE q.vec_id < 50) r
       |WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin) { (s, dir) =>
    val all = vecs(s, dir)
    val cents = KMeansLite.fit(all, "vec_id", "v", k = 8, iters = 3)
    val cells = KMeansLite.assign(all, "v", cents)
    val queries = cells.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("cell").as("qcell"),
        col("v").as("qv"), col("nrm").as("qnrm"))
    val scored = cells.join(queries,
        col("cell") === col("qcell") && col("vec_id") =!= col("qid"))
      .withColumn("cos_sim", expr(dotExpr) / (col("qnrm") * col("nrm")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("qid"), col("vec_id").as("nid"), col("cos_sim"),
        col("rnk").cast("long").as("rnk"))
      .orderBy("qid", "rnk")
  }

  /** q115 with MULTI-PROBE: each query searches its 2 nearest cells
    * instead of 1 — the standard IVF recall fix for vectors near cell
    * boundaries, at 2× probe cost and unchanged build cost. Probe-cell
    * selection uses the same sequential (a-b)² fold as the assignment
    * (bit-exact vs the oracle's list_sum replay); each corpus vector
    * lives in exactly one cell, so the two probes never duplicate a
    * candidate. At 100 TB this stays the cell equi-join shape — the
    * probe list is a 2-row expansion of the bounded query set. */
  private val q126 = Q(
    "q126_ivf_multiprobe",
    s"""${kmeansOracleCtes(k = 8, iters = 3, dim = 64)},
       |qp AS (
       |  SELECT qid, qv, qnrm, pcell FROM (
       |    SELECT q.vec_id AS qid, q.v AS qv, q.nrm AS qnrm, c.cid AS pcell,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
       |        list_sum(list_transform(range(1, 65),
       |          i -> (q.v[CAST(i AS INT)] - c.cv[CAST(i AS INT)])
       |             * (q.v[CAST(i AS INT)] - c.cv[CAST(i AS INT)]))), c.cid) AS prn
       |    FROM nn q CROSS JOIN c3 c
       |    WHERE q.vec_id < 50) WHERE prn <= 2)
       |SELECT qid, nid, cos_sim, rnk FROM (
       |  SELECT p.qid, n.vec_id AS nid,
       |    list_sum(list_transform(range(1, 65),
       |      i -> p.qv[CAST(i AS INT)] * n.v[CAST(i AS INT)])) / (p.qnrm * n.nrm) AS cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY p.qid
       |      ORDER BY list_sum(list_transform(range(1, 65),
       |        i -> p.qv[CAST(i AS INT)] * n.v[CAST(i AS INT)])) / (p.qnrm * n.nrm) DESC,
       |        n.vec_id) AS rnk
       |  FROM qp p JOIN nn n ON n.cell = p.pcell AND n.vec_id <> p.qid) r
       |WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin) { (s, dir) =>
    import s.implicits._
    val all = vecs(s, dir)
    val cents = KMeansLite.fit(all, "vec_id", "v", k = 8, iters = 3)
    val cells = KMeansLite.assign(all, "v", cents)
    val centDf = broadcast(
      cents.zipWithIndex.map { case (c, i) => (i, c) }.toSeq.toDF("cid", "cv"))
    // Top-2 probe cells per query: same sequential squared-distance fold
    // as NearestCell (50×8 rows — interpreted HOF is off the hot path).
    val d2 = expr(
      """aggregate(zip_with(qv, cv, (a, b) -> (a - b) * (a - b)),
        |CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)""".stripMargin)
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("d2"), col("cid"))
    val probes = cells.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
      .join(centDf, expr("true"))
      .withColumn("d2", d2)
      .withColumn("prn", row_number().over(pw))
      .filter(col("prn") <= 2)
      .select(col("qid"), col("qv"), col("qnrm"), col("cid").as("pcell"))
    val scored = cells.join(probes,
        col("cell") === col("pcell") && col("vec_id") =!= col("qid"))
      .withColumn("cos_sim", expr(dotExpr) / (col("qnrm") * col("nrm")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("qid"), col("vec_id").as("nid"), col("cos_sim"),
        col("rnk").cast("long").as("rnk"))
      .orderBy("qid", "rnk")
  }


  // ------------- q279: grid-bucketed spatial radius join

  /** All point pairs within radius 600 on an integer plane whose side
    * scales with sqrt(table size) — constant density, so the PAIR
    * COUNT and the per-cell candidate fan-out stay linear in the
    * corpus at any scale-up (a fixed plane would make both quadratic).
    * Coords derive deterministically from c_custkey; the y map is
    * nonlinear so x/y deltas decorrelate and real near-pairs exist.
    * The Spark side NEVER builds an all-pairs surface: each point
    * probes the 3×3 neighborhood of 1000-unit grid cells (radius <
    * cell size makes the candidate set lossless) via an EQUI-join on
    * cell keys. Requiring prober < home id emits each pair exactly
    * once. The all-pairs spelling is oracle-only. */
  private val q279 = Q(
    "q279_grid_radius_join",
    // Grid-BLOCKED oracle (r17, verdict #9): the former all-pairs
    // `a.id < b.id` spelling is quadratic and timed out of the 100x
    // sweep budget. radius 600 < cell 1000 makes the 3×3-neighborhood
    // equi-join LOSSLESS (any in-radius pair differs by ≤1 cell per
    // axis, and each (dx,dy) probe targets a distinct cell so a pair is
    // emitted exactly once) — the same theorem the Spark side uses,
    // implemented independently in DuckDB SQL. Identical rows at every
    // SF by construction; verified by the 3-SF gate + 10x/100x sweeps.
    """WITH m AS (
      |  SELECT CAST(floor(sqrt(max(c_custkey)) * 2582) AS BIGINT) AS side
      |  FROM customer),
      |pts AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS id,
      |    (c_custkey * 48271) % side AS x,
      |    (c_custkey * c_custkey) % side AS y
      |  FROM customer CROSS JOIN m),
      |cells AS (
      |  SELECT id, x, y, x // 1000 AS cx, y // 1000 AS cy FROM pts),
      |probes AS (
      |  SELECT id, x, y, cx + dx.d AS cx, cy + dy.d AS cy
      |  FROM cells,
      |    (VALUES (-1), (0), (1)) dx(d), (VALUES (-1), (0), (1)) dy(d))
      |SELECT a.id AS id_a, b.id AS id_b,
      |  CAST((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS BIGINT) AS dist2
      |FROM probes a JOIN cells b
      |  ON a.cx = b.cx AND a.cy = b.cy AND a.id < b.id
      |WHERE (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 360000
      |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    val customer = Tables.load(s, dir, "customer")
    // plane side ~ sqrt(n): a single scalar, metadata-bounded driver pull
    val side = math.floor(math.sqrt(
      customer.agg(max(col("c_custkey")).cast("long")).head().getLong(0)
        .toDouble) * 2582).toLong
    val pts = customer.select(
      col("c_custkey").cast("long").as("id"),
      ((col("c_custkey") * 48271L) % side).as("x"),
      ((col("c_custkey") * col("c_custkey")) % side).as("y"))
      .withColumn("cx", expr("x div 1000"))
      .withColumn("cy", expr("y div 1000"))
    val probes = pts.select(col("id").as("id_a"), col("x").as("xa"),
        col("y").as("ya"),
        explode(expr(
          """flatten(transform(sequence(-1, 1), dx ->
            |  transform(sequence(-1, 1), dy ->
            |    struct(cx + dx AS cx, cy + dy AS cy))))""".stripMargin))
          .as("cell"))
      .select(col("id_a"), col("xa"), col("ya"),
        col("cell.cx").as("cx"), col("cell.cy").as("cy"))
    probes.join(pts.select(col("id").as("id_b"), col("x").as("xb"),
        col("y").as("yb"), col("cx"), col("cy")), Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist2",
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("dist2") <= 360000L)
      .select(col("id_a"), col("id_b"), col("dist2").cast("long").as("dist2"))
      .orderBy("id_a", "id_b")
  }

  // ------------- q293: hybrid retrieval — BM25 + cosine, RRF fusion

  /** Canned retrieval queries: lexical terms (q208's set) plus, per
    * query, a probe embedding = the embedding of vec_id 100*query_id. */
  private val RrfQueries = Seq(
    (1L, "hash"), (1L, "join"),
    (2L, "scan"), (2L, "filter"), (2L, "column"),
    (3L, "stream"), (3L, "window"))

  private val RrfK = 60      // the standard RRF dampening constant

  private val RrfDepth = 20  // per-modality candidate depth

  private val RrfTop = 10    // fused results per query

  // hybrid retrieval (integer BM25 lexical ranks fused with
  // embedding-cosine ranks by reciprocal-rank fusion);
  /** Hybrid (lexical + semantic) retrieval with reciprocal-rank fusion:
    * each modality contributes floor(1e6 / (60 + rank)) for its top-20,
    * summed per (query, doc) via a FULL OUTER join of the two rank
    * lists, fused top-10 by (rrf DESC, doc_id). Integer micro-units end
    * to end — no float drift between engines. Scale shape: the lexical
    * side is q208's vocabulary-pruned tf/df pipeline (the corpus scan
    * keeps only query-term tokens); the vector side broadcasts the
    * bounded query batch over one corpus pass (q47's shape — q49's IVF
    * is the drop-in at 100 TB); the fusion join touches only
    * queries x 20 rows per side. */
  private val q293 = Q(
    "q293_hybrid_retrieval_rrf", {
      val cos =
        """(list_sum(list_transform(range(1, len(q.embedding) + 1),
          |   i -> CAST(q.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE)))
          | / (sqrt(list_sum(list_transform(range(1, len(q.embedding) + 1),
          |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
          |  * sqrt(list_sum(list_transform(range(1, len(n.embedding) + 1),
          |      i -> CAST(n.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE))))))""".stripMargin
      s"""WITH qt(query_id, term) AS (VALUES
         |    ${RrfQueries.map { case (q, t) => s"($q, '$t')" }.mkString(", ")}),
         |tok AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
         |          w -> w <> '')) AS w FROM documents),
         |tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1, 2),
         |nd AS (SELECT count(*) AS n FROM documents),
         |dfc AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
         |sc AS (
         |  SELECT qt.query_id AS query_id, tf.doc_id AS doc_id,
         |    sum((((2 * (nd.n - dfc.df) + 1) * 1000000) // (2 * dfc.df + 1))
         |        * tf.tf // (tf.tf + 2)) AS score
         |  FROM qt JOIN tf ON tf.w = qt.term
         |  JOIN dfc ON dfc.w = qt.term CROSS JOIN nd
         |  GROUP BY 1, 2),
         |lex AS (SELECT query_id, doc_id, row_number() OVER (
         |          PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
         |        FROM sc),
         |qv AS (SELECT vec_id // 100 AS query_id, embedding
         |       FROM embeddings WHERE vec_id IN (100, 200, 300)),
         |vr AS (SELECT query_id, doc_id, row_number() OVER (
         |          PARTITION BY query_id ORDER BY cs DESC, doc_id) AS rnk
         |       FROM (SELECT q.query_id AS query_id, n.vec_id AS doc_id,
         |               $cos AS cs
         |             FROM qv q JOIN embeddings n
         |               ON n.vec_id <> q.query_id * 100)),
         |fused AS (
         |  SELECT COALESCE(l.query_id, v.query_id) AS query_id,
         |    COALESCE(l.doc_id, v.doc_id) AS doc_id,
         |    COALESCE(1000000 // ($RrfK + l.rnk), 0)
         |      + COALESCE(1000000 // ($RrfK + v.rnk), 0) AS rrf
         |  FROM (SELECT * FROM lex WHERE rnk <= $RrfDepth) l
         |  FULL JOIN (SELECT * FROM vr WHERE rnk <= $RrfDepth) v
         |    ON l.query_id = v.query_id AND l.doc_id = v.doc_id)
         |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
         |  CAST(rrf AS BIGINT) AS rrf, CAST(rnk AS BIGINT) AS rnk
         |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY rrf DESC, doc_id) AS rnk FROM fused)
         |WHERE rnk <= $RrfTop ORDER BY query_id, rnk""".stripMargin
    }) { (s, dir) =>
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val documents = Tables.load(s, dir, "documents")
    // Lexical ranks: q208's integer BM25 (vocabulary-pruned scan).
    val qt = RrfQueries.toDF("query_id", "term")
    val tok = documents
      .select(col("doc_id"), explode(expr("graft_words(text)")).as("w"))
    val hits = tok
      .join(broadcast(qt.select("term").distinct()), col("w") === col("term"))
      .select("doc_id", "w")
    val tf = hits.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val nDocs = documents.agg(count(lit(1)).as("n_docs"))
    val contrib = expr(
      """((((2 * (n_docs - df) + 1) * 1000000) div (2 * df + 1)) * tf)
        |  div (tf + 2)""".stripMargin)
    val lexW = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"))
    val lex = qt
      .join(tf.withColumnRenamed("w", "term"), "term")
      .join(broadcast(dfc.withColumnRenamed("w", "term")), "term")
      .crossJoin(broadcast(nDocs))
      .groupBy("query_id", "doc_id")
      .agg(sum(contrib).as("score"))
      .withColumn("lrnk", row_number().over(lexW))
      .filter(col("lrnk") <= RrfDepth)
      .select(col("query_id"), col("doc_id"), col("lrnk"))
    // Vector ranks: bounded query batch broadcast over one corpus pass.
    val all = VectorOps.vecs(s, dir)
    val qv = all.filter(col("vec_id").isin(100L, 200L, 300L))
      .select((col("vec_id") / 100).cast("long").as("qid"),
        col("v").as("qv"), col("nrm").as("qnrm"))
    val vecW = Window.partitionBy("qid")
      .orderBy(col("cs").desc, col("vec_id"))
    val vr = all.join(broadcast(qv), col("vec_id") =!= col("qid") * 100)
      .withColumn("cs", expr("graft_dot(qv, v)") / (col("qnrm") * col("nrm")))
      .withColumn("vrnk", row_number().over(vecW))
      .filter(col("vrnk") <= RrfDepth)
      .select(col("qid"), col("vec_id").as("vdoc"), col("vrnk"))
    // Reciprocal-rank fusion over the two (tiny) rank lists.
    val fused = lex.join(vr,
        col("query_id") === col("qid") && col("doc_id") === col("vdoc"),
        "full_outer")
      .select(
        coalesce(col("query_id"), col("qid")).as("query_id"),
        coalesce(col("doc_id"), col("vdoc")).as("doc_id"),
        (coalesce(expr(s"1000000 div ($RrfK + lrnk)"), lit(0L))
          + coalesce(expr(s"1000000 div ($RrfK + vrnk)"), lit(0L))).as("rrf"))
    val fuseW = Window.partitionBy("query_id")
      .orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rnk", row_number().over(fuseW).cast("long"))
      .filter(col("rnk") <= RrfTop)
      .select(col("query_id"), col("doc_id"), col("rrf"), col("rnk"))
      .orderBy("query_id", "rnk")
  }

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

  // IVF index persistence + incremental update: fit once on the
  // initial corpus, PERSIST the index (centroids + postings), then a
  // new vector batch is indexed by assigning against the FROZEN
  // centroids and appending postings — the production ANN lifecycle
  // (refitting on every ingest would re-shuffle the world; freezing
  // trades a little recall for O(batch) updates);
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

  private val Dim = 64

  /** embedding drift: the corpus split into two halves by
    * vec_id parity (standing in for "yesterday's batch vs today's"),
    * per label the component-wise centroid compared between halves
    * as the exact integer L1 numerator Σᵢ |sumAᵢ·nB − sumBᵢ·nA|
    * (cross-multiplied mean difference — no division until the
    * consumer wants it). Components quantize via explicit floor(
    * double(v)·10⁴) clamped to ±10⁷ — CAST(float AS BIGINT) rounds in
    * DuckDB but truncates in Spark, float-precision products floor
    * differently than double ones, and unclamped adversarial ±1e30
    * components overflow the integer chain: all three pinned here. The shuffle is
    * (label × dim × half) partial sums — embedding-table-linear,
    * the distribution-shift monitor for a feature store;
    */
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
  val defs: Seq[Q] = Seq(q279, q293, q316, q368, q47, q48, q49, q115, q123, q126, q147)
}
