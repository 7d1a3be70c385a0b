package graft.operators

import graft.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the vector-compression half of ANN at
  * 100 TB: a 64-dim embedding becomes a 4-byte code (one sub-centroid
  * id per 16-dim subspace), cutting index memory ~64× while distance
  * tables over the 4×4 codebooks approximate full distances.
  *
  * Scale design: each subspace codebook is fit with [[KMeansLite]] —
  * centroids are metadata (k × subDim doubles on the driver, exactly
  * like production PQ training on a sample), each fit iteration is one
  * broadcast + map-side assign + partial-aggregated groupBy, and the
  * final code assembly is four narrow equi-joins on vec_id. Nothing
  * about the corpus ever lands on the driver.
  *
  * Determinism: the fit is the same bit-exact machinery the q115 IVF
  * oracle replays (lowest-id init, fixed iterations, argmin ties to the
  * lowest cell, 2^30-quantized integer-sum means), applied per
  * subspace; the quantization error is a fixed-order sequential fold,
  * so both engines emit identical doubles.
  */
object VectorOps2 {

  private val Subs = 4
  private val SubDim = 16
  private val K = 4
  private val Iters = 2

  /** DuckDB replay of one subspace's fit+assign (suffix `m` keeps CTE
    * names unique inside one WITH). Mirrors VectorOps.kmeansOracleCtes
    * with the vector source sliced to the subspace. `vvBody` overrides
    * the subvector source (default: the contiguous PQ slice) — the OPQ
    * variant (q402) supplies a permuted-dimension gather instead. */
  private def subspaceCtes(m: Int, vvBody: String = null): String = {
    val S = "1073741824.0" // KMeansLite.MeanScale
    val C = "4294967296.0" // KMeansLite.QClamp
    val lo = m * SubDim + 1
    val hi = (m + 1) * SubDim
    def d2(v: String, cv: String) =
      s"""list_sum(list_transform(range(1, ${SubDim + 1}),
         |      i -> ($v[CAST(i AS INT)] - $cv[CAST(i AS INT)])
         |         * ($v[CAST(i AS INT)] - $cv[CAST(i AS INT)])))""".stripMargin
    def assignCte(name: String, cents: String, keepD2: Boolean) =
      s"""$name AS (
         |  SELECT vec_id, v, cell${if (keepD2) ", d2" else ""} FROM (
         |    SELECT vec_id, v, cid AS cell, d2,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |    FROM (SELECT vec_id, v, cid, ${d2("v", "cv")} AS d2
         |          FROM vv$m CROSS JOIN $cents)) WHERE rn = 1)""".stripMargin
    def centerCte(name: String, assigned: String, prev: String) =
      s"""$name AS (
         |  SELECT p.cid, COALESCE(u.cv, p.cv) AS cv
         |  FROM $prev p LEFT JOIN (
         |    SELECT cell AS cid, list(mn ORDER BY pos) AS cv FROM (
         |      SELECT cell, pos,
         |        CAST(SUM(q) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * $S) AS mn
         |      FROM (SELECT cell, i AS pos,
         |              CAST(round(least(greatest(v[CAST(i AS INT)], -$C), $C) * $S)
         |                   AS BIGINT) AS q
         |            FROM $assigned CROSS JOIN range(1, ${SubDim + 1}) t(i))
         |      GROUP BY cell, pos) GROUP BY cell) u ON p.cid = u.cid)""".stripMargin
    val iterCtes = (1 to Iters).map { t =>
      assignCte(s"a$m$t", s"c$m${t - 1}", keepD2 = false) + ",\n" +
        centerCte(s"c$m$t", s"a$m$t", s"c$m${t - 1}")
    }.mkString(",\n")
    val vv = Option(vvBody).getOrElse(
      s"""SELECT vec_id,
         |    list_transform(embedding[$lo:$hi], x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings""".stripMargin)
    s"""vv$m AS (
       |  $vv),
       |c${m}0 AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
       |         v AS cv
       |  FROM (SELECT vec_id, v FROM vv$m ORDER BY vec_id LIMIT $K)),
       |$iterCtes,
       |${assignCte(s"af$m", s"c$m$Iters", keepD2 = true)}""".stripMargin
  }

  private val q223 = Q(
    "q223_product_quantization",
    s"""WITH ${(0 until Subs).map(m => subspaceCtes(m)).mkString(",\n")}
       |SELECT af0.vec_id AS vec_id,
       |  CAST(af0.cell AS BIGINT) AS c0, CAST(af1.cell AS BIGINT) AS c1,
       |  CAST(af2.cell AS BIGINT) AS c2, CAST(af3.cell AS BIGINT) AS c3,
       |  CAST(((af0.cell * $K + af1.cell) * $K + af2.cell) * $K + af3.cell
       |    AS BIGINT) AS code,
       |  af0.d2 + af1.d2 + af2.d2 + af3.d2 AS qerr
       |FROM af0 JOIN af1 USING (vec_id) JOIN af2 USING (vec_id)
       |JOIN af3 USING (vec_id)
       |ORDER BY vec_id""".stripMargin) { (s, dir) =>
    val all = VectorOps.vecs(s, dir)
    val parts = (0 until Subs).map { m =>
      val sub = all.select(col("vec_id"),
        expr(s"slice(v, ${m * SubDim + 1}, $SubDim)").as("sv"))
      val cents = KMeansLite.fit(sub, "vec_id", "sv", K, Iters)
      val centDf = broadcast(s.createDataFrame(
        s.sparkContext.parallelize(cents.zipWithIndex.map {
          case (cv, i) => org.apache.spark.sql.Row(i, cv.toSeq) }, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("cell",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("cv",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType))))))
      KMeansLite.assign(sub, "sv", cents)
        .join(centDf, "cell")
        .select(col("vec_id"), col("cell").cast("long").as(s"c$m"),
          expr(s"""aggregate(sequence(1, $SubDim), CAST(0 AS DOUBLE),
                  |  (acc, i) -> acc + (element_at(sv, i) - element_at(cv, i))
                  |            * (element_at(sv, i) - element_at(cv, i)))"""
            .stripMargin).as(s"d$m"))
    }
    parts.reduce(_.join(_, "vec_id"))
      .select(col("vec_id"), col("c0"), col("c1"), col("c2"), col("c3"),
        expr(s"((c0 * $K + c1) * $K + c2) * $K + c3").as("code"),
        (col("d0") + col("d1") + col("d2") + col("d3")).as("qerr"))
      .orderBy("vec_id")
  }

  // --------------------- q233: ANN recall@k evaluation

  /** Queries evaluated (vec_id < 50, the q49 query set) and k. */
  private val RecallK = 3

  private val q233 = Q(
    "q233_ann_recall", {
      def topk(joinCond: String) =
        s"""SELECT qid, nid FROM (
           |  SELECT q.vec_id AS qid, n.vec_id AS nid,
           |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |      ORDER BY ${VectorOps.duckCos("q", "n")} DESC, n.vec_id) AS rnk
           |  FROM embeddings q JOIN embeddings n ON $joinCond
           |  WHERE q.vec_id < 50) r WHERE rnk <= $RecallK""".stripMargin
      s"""WITH ann AS (${topk("q.label = n.label AND q.vec_id <> n.vec_id")}),
         |ex AS (${topk("q.vec_id <> n.vec_id")})
         |SELECT ex.qid AS qid, CAST(count(*) AS BIGINT) AS k,
         |  CAST(count(ann.nid) AS BIGINT) AS n_hits,
         |  CAST(count(ann.nid) * 10000 // count(*) AS BIGINT) AS recall_bp
         |FROM ex LEFT JOIN ann ON ann.qid = ex.qid AND ann.nid = ex.nid
         |GROUP BY 1 ORDER BY 1""".stripMargin
    }) { (s, dir) =>
    // ANN quality measured, not assumed: recall@3 of the cell-restricted
    // search (q49's IVF shape) against the exact brute-force top-3, per
    // query. The exact side is a BroadcastNestedLoopJoin of the 50-query
    // set against the corpus — bounded by the QUERY count (an eval-set
    // contract, like q131's broadcast eval set), not by corpus²; the ANN
    // side is the same cell equi-join the production path uses. Output
    // is integer hit counts — the ranking runs on identical doubles on
    // both engines (the q47-q49 determinism rule), the emitted recall
    // doesn't.
    import org.apache.spark.sql.expressions.Window
    val all = VectorOps.vecs(s, dir)
    val q = all.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("v").as("qv"), col("nrm").as("qnrm"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cos_sim").desc, col("vec_id"))
    def topk(scored: DataFrame): DataFrame = scored
      .withColumn("cos_sim",
        expr("graft_dot(qv, v)") / (col("qnrm") * col("nrm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= RecallK)
      .select(col("qid"), col("vec_id").as("nid"))
    val ann = topk(all.join(q,
      col("label") === col("qlabel") && col("vec_id") =!= col("qid")))
    val ex = topk(all.join(broadcast(q), col("vec_id") =!= col("qid")))
    ex.join(ann.withColumn("hit", lit(1)), Seq("qid", "nid"), "left")
      .groupBy("qid")
      .agg(count(lit(1)).as("k"), count(col("hit")).as("n_hits"))
      .select(col("qid"), col("k"), col("n_hits"),
        expr("n_hits * 10000 div k").as("recall_bp"))
      .orderBy("qid")
  }

  // --------------------- q399: PQ asymmetric-distance (ADC) top-k scan

  /** Bounded query set (the q49/q115/q233 eval-set contract). */
  private val AdcQueries = 50
  private val AdcK = 3

  /** q399: the SEARCH leg of product quantization — the asymmetric
    * distance computation (ADC) scan. q223 builds the index (each
    * vector compressed to [[Subs]] sub-centroid codes); here a query
    * precomputes one lookup table of ‖q_sub − centroid‖² per
    * (subspace, centroid) — [[Subs]]×[[K]] doubles — and every
    * database vector's approximate distance is [[Subs]] LUT lookups
    * summed, never touching the raw 64 floats. This is why PQ works at
    * 100 TB: the scan reads m-byte codes instead of 256-byte vectors
    * (~64× less IO), the LUT rides along with the (bounded) query set
    * as a broadcast, and the whole scan is one linear codegen pass +
    * one bounded top-k per query. Determinism: the codebooks are the
    * bit-exact [[KMeansLite]] fit the oracle replays per subspace, the
    * per-subspace distance is the same sequential fold, and the four
    * subspace distances add left-to-right — both engines emit
    * identical doubles, ties break on vec_id. */
  private val q399 = Q(
    "q399_pq_adc_search", {
      def d2(v: String, cv: String) =
        s"""list_sum(list_transform(range(1, ${SubDim + 1}),
           |      i -> ($v[CAST(i AS INT)] - $cv[CAST(i AS INT)])
           |         * ($v[CAST(i AS INT)] - $cv[CAST(i AS INT)])))""".stripMargin
      val adist = (0 until Subs).map(m => s"${d2(s"q.q$m", s"k$m.cv")}")
        .mkString("\n    + ")
      s"""WITH ${(0 until Subs).map(m => subspaceCtes(m)).mkString(",\n")},
         |codes AS (
         |  SELECT af0.vec_id,
         |    ${(0 until Subs).map(m => s"af$m.cell AS x$m").mkString(", ")}
         |  FROM af0 ${(1 until Subs).map(m => s"JOIN af$m USING (vec_id)").mkString(" ")}),
         |qs AS (
         |  SELECT vv0.vec_id AS qid,
         |    ${(0 until Subs).map(m => s"vv$m.v AS q$m").mkString(", ")}
         |  FROM vv0 ${(1 until Subs).map(m =>
              s"JOIN vv$m ON vv$m.vec_id = vv0.vec_id").mkString(" ")}
         |  WHERE vv0.vec_id < $AdcQueries)
         |SELECT qid, nid, adist, rnk FROM (
         |  SELECT q.qid, x.vec_id AS nid,
         |    $adist AS adist,
         |    ROW_NUMBER() OVER (PARTITION BY q.qid
         |      ORDER BY $adist, x.vec_id) AS rnk
         |  FROM qs q JOIN codes x ON x.vec_id <> q.qid
         |  ${(0 until Subs).map(m =>
              s"JOIN c$m$Iters k$m ON k$m.cid = x.x$m").mkString("\n  ")})
         |WHERE rnk <= $AdcK ORDER BY qid, rnk""".stripMargin
    }) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val all = VectorOps.vecs(s, dir)
    // per-subspace codebooks: driver metadata (Subs × K × SubDim doubles)
    val fits = (0 until Subs).map { m =>
      val sub = all.select(col("vec_id"),
        expr(s"slice(v, ${m * SubDim + 1}, $SubDim)").as("sv"))
      (m, sub, KMeansLite.fit(sub, "vec_id", "sv", K, Iters))
    }
    // the compressed index: vec_id + Subs small codes, via narrow
    // equi-joins on vec_id (the q223 assembly shape)
    val codes = fits.map { case (m, sub, cents) =>
      KMeansLite.assign(sub, "sv", cents)
        .select(col("vec_id"), col("cell").cast("int").as(s"c$m"))
    }.reduce(_.join(_, "vec_id"))
    // query-side LUT: ‖q_sub − centroid‖² for every (subspace, centroid)
    // as literal-centroid codegen folds — Subs*K doubles per query row
    val lutEntries = for {
      (m, _, cents) <- fits
      cell <- 0 until K
    } yield aggregate(
      zip_with(
        slice(col("qv"), m * SubDim + 1, SubDim),
        array(cents(cell).map(lit(_)): _*),
        (a, b) => (a - b) * (a - b)),
      lit(0.0),
      (acc, x) => acc + x)
    val queries = all.filter(col("vec_id") < AdcQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
      .withColumn("lut", array(lutEntries: _*))
      .select("qid", "lut")
    // ADC scan: broadcast the bounded query set against the code table;
    // adist = Subs LUT lookups added left-to-right (deterministic)
    val adist = (0 until Subs)
      .map(m => element_at(col("lut"), lit(m * K) + col(s"c$m") + 1))
      .reduce(_ + _)
    val w = Window.partitionBy("qid").orderBy(col("adist"), col("vec_id"))
    codes.join(broadcast(queries), col("vec_id") =!= col("qid"))
      .withColumn("adist", adist)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= AdcK)
      .select(col("qid"), col("vec_id").as("nid"), col("adist"),
        col("rnk").cast("long").as("rnk"))
      .orderBy("qid", "rnk")
  }

  // --------------- q402: OPQ-style energy-balanced dimension allocation

  /** Clamp/scale for the per-dimension energy statistic: |q| ≤ 2^21, so
    * q² ≤ 2^42 and a 200k-row sum stays < 2^60 (overflow-proof through
    * the 100x corpus AND the adversarial ±1e30 components, which the
    * clamp absorbs — the KMeansLite QClamp lesson applied to squares). */
  private val OpqClamp = 2048.0
  private val OpqScale = 1024.0

  /** q402: the OPQ idea at its deployable core — PQ quality depends on
    * how DIMENSIONS are allocated to subspaces, so instead of q223's
    * naive contiguous slices the dimensions are ranked by an exact
    * integer energy statistic (Σ quantized², order-independent — the
    * only cross-engine-safe "variance") and dealt into the [[Subs]]
    * subspaces in SNAKE order (1,2,3,4,4,3,2,1,…), balancing total
    * energy per subspace the way full OPQ's learned rotation balances
    * it continuously. Everything downstream is q223's machinery on the
    * permuted gathers: per-subspace KMeansLite codebooks, 4-byte codes,
    * sequential-fold quantization error. The permutation is data-
    * derived yet bit-exactly replayable: integer energies, total
    * (energy DESC, dim) order, pure-arithmetic snake assignment. */
  private val q402 = Q(
    "q402_opq_balanced_pq", {
      val qx = "CAST(round(least(greatest(" +
        s"CAST(embedding[CAST(i AS INT)] AS DOUBLE), -$OpqClamp), $OpqClamp)" +
        s" * $OpqScale) AS BIGINT)"
      val opqVv = (m: Int) =>
        s"""SELECT e.vec_id,
           |    list_transform(g.dims,
           |      d -> CAST(e.embedding[CAST(d AS INT)] AS DOUBLE)) AS v
           |  FROM embeddings e CROSS JOIN grp g WHERE g.grp = $m""".stripMargin
      s"""WITH en AS (
         |  SELECT i AS dim, SUM(($qx) * ($qx)) AS e
         |  FROM embeddings CROSS JOIN range(1, 65) t(i)
         |  GROUP BY 1),
         |rk AS (
         |  SELECT dim, ROW_NUMBER() OVER (ORDER BY e DESC, dim) - 1 AS r0
         |  FROM en),
         |ga AS (
         |  SELECT dim, CASE WHEN (r0 // $Subs) % 2 = 0 THEN r0 % $Subs
         |                   ELSE $Subs - 1 - (r0 % $Subs) END AS grp
         |  FROM rk),
         |grp AS (SELECT grp, list(dim ORDER BY dim) AS dims FROM ga GROUP BY 1),
         |${(0 until Subs).map(m => subspaceCtes(m, opqVv(m))).mkString(",\n")}
         |SELECT af0.vec_id AS vec_id,
         |  CAST(af0.cell AS BIGINT) AS c0, CAST(af1.cell AS BIGINT) AS c1,
         |  CAST(af2.cell AS BIGINT) AS c2, CAST(af3.cell AS BIGINT) AS c3,
         |  CAST(((af0.cell * $K + af1.cell) * $K + af2.cell) * $K + af3.cell
         |    AS BIGINT) AS code,
         |  af0.d2 + af1.d2 + af2.d2 + af3.d2 AS qerr
         |FROM af0 JOIN af1 USING (vec_id) JOIN af2 USING (vec_id)
         |JOIN af3 USING (vec_id)
         |ORDER BY vec_id""".stripMargin
    }) { (s, dir) =>
    val all = VectorOps.vecs(s, dir)
    // 1. per-dimension integer energies — one aggregation, 64 longs to
    //    the driver (metadata, like KMeansLite's centroids)
    def qx(j: Int) =
      s"CAST(round(least(greatest(element_at(v, $j), -$OpqClamp), " +
        s"$OpqClamp) * $OpqScale) AS BIGINT)"
    val eRow = all.agg(
      sum(expr(s"(${qx(1)}) * (${qx(1)})")).as("e1"),
      (2 to 64).map(j => sum(expr(s"(${qx(j)}) * (${qx(j)})")).as(s"e$j")): _*)
      .first()
    val energies = (0 until 64).map(i => eRow.getLong(i))
    // 2. snake-deal dims (1-based) into Subs groups, ascending in-group
    val ranked = (1 to 64).sortBy(j => (-energies(j - 1), j))
    val dimsOf = Array.fill(Subs)(Seq.newBuilder[Int])
    ranked.zipWithIndex.foreach { case (dim, r0) =>
      val g = if ((r0 / Subs) % 2 == 0) r0 % Subs else Subs - 1 - (r0 % Subs)
      dimsOf(g) += dim
    }
    val groups = dimsOf.map(_.result().sorted)
    // 3. q223's PQ machinery over the permuted gathers
    val parts = (0 until Subs).map { m =>
      val gather = groups(m).map(d => s"element_at(v, $d)").mkString(", ")
      val sub = all.select(col("vec_id"), expr(s"array($gather)").as("sv"))
      val cents = KMeansLite.fit(sub, "vec_id", "sv", K, Iters)
      KMeansLite.assign(sub, "sv", cents)
        .join(broadcast(s.createDataFrame(
          s.sparkContext.parallelize(cents.zipWithIndex.map {
            case (cv, i) => org.apache.spark.sql.Row(i, cv.toSeq) }, 1),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("cell",
              org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("cv",
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.DoubleType)))))), "cell")
        .select(col("vec_id"), col("cell").cast("long").as(s"c$m"),
          expr(s"""aggregate(sequence(1, $SubDim), CAST(0 AS DOUBLE),
                  |  (acc, i) -> acc + (element_at(sv, i) - element_at(cv, i))
                  |            * (element_at(sv, i) - element_at(cv, i)))"""
            .stripMargin).as(s"d$m"))
    }
    parts.reduce(_.join(_, "vec_id"))
      .select(col("vec_id"), col("c0"), col("c1"), col("c2"), col("c3"),
        expr(s"((c0 * $K + c1) * $K + c2) * $K + c3").as("code"),
        (col("d0") + col("d1") + col("d2") + col("d3")).as("qerr"))
      .orderBy("vec_id")
  }

  // ------------- q405: Matryoshka (truncated-dimension) recall eval

  private val MrlDims = Seq(16, 32, 64)

  /** q405: Matryoshka-representation evaluation — how much top-k
    * retrieval survives TRUNCATING the embedding to its leading 16/32
    * dimensions (the MRL deployment question: a 4× smaller index and
    * 4× cheaper scan vs recall). For each query (the q233 eval-set
    * contract: bounded query count broadcast against the corpus, never
    * corpus²) the exact top-3 under each prefix length is compared to
    * the full-dimension top-3; output is integer hit counts in basis
    * points. Determinism: prefix cosines are sequential folds over the
    * same doubles on both engines, ranking ties break on vec_id, and
    * only integer counts are emitted (the q47–q49 rule). */
  private val q405 = Q(
    "q405_matryoshka_recall", {
      def cosD(d: Int, a: String, b: String) =
        s"""(list_sum(list_transform(range(1, ${d + 1}),
           |   i -> CAST($a.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE)))
           | / (sqrt(list_sum(list_transform(range(1, ${d + 1}),
           |      i -> CAST($a.embedding[i] AS DOUBLE) * CAST($a.embedding[i] AS DOUBLE))))
           |  * sqrt(list_sum(list_transform(range(1, ${d + 1}),
           |      i -> CAST($b.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE))))))""".stripMargin
      def topk(d: Int) =
        s"""SELECT qid, nid FROM (
           |  SELECT q.vec_id AS qid, n.vec_id AS nid,
           |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |      ORDER BY ${cosD(d, "q", "n")} DESC, n.vec_id) AS rnk
           |  FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
           |  WHERE q.vec_id < 50) r WHERE rnk <= $RecallK""".stripMargin
      s"""WITH full64 AS (${topk(64)}),
         |${MrlDims.map(d => s"t$d AS (${topk(d)})").mkString(",\n")}
         |${MrlDims.map(d =>
           s"""SELECT f.qid AS qid, $d AS dim,
              |  CAST(count(t$d.nid) AS BIGINT) AS n_hits,
              |  CAST(count(t$d.nid) * 10000 // count(*) AS BIGINT) AS recall_bp
              |FROM full64 f LEFT JOIN t$d
              |  ON t$d.qid = f.qid AND t$d.nid = f.nid
              |GROUP BY 1""".stripMargin).mkString("\nUNION ALL\n")}
         |ORDER BY qid, dim""".stripMargin
    }) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val all = VectorOps.vecs(s, dir)
    val q = all.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cos_sim").desc, col("vec_id"))
    def topk(d: Int): DataFrame = all
      .join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cos_sim",
        expr(s"graft_dot(slice(qv, 1, $d), slice(v, 1, $d))") /
          (sqrt(expr(s"graft_dot(slice(qv, 1, $d), slice(qv, 1, $d))")) *
            sqrt(expr(s"graft_dot(slice(v, 1, $d), slice(v, 1, $d))"))))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= RecallK)
      .select(col("qid"), col("vec_id").as("nid"))
    val full = topk(64)
    MrlDims.map { d =>
      full.join(topk(d).withColumn("hit", lit(1)), Seq("qid", "nid"), "left")
        .groupBy("qid")
        .agg(count(lit(1)).as("k"), count(col("hit")).as("n_hits"))
        .select(col("qid"), lit(d).cast("int").as("dim"),
          col("n_hits").cast("long"),
          expr("n_hits * 10000 div k").cast("long").as("recall_bp"))
    }.reduce(_.unionByName(_))
      .orderBy("qid", "dim")
  }

  // --------------------- q407: IVF × PQ — the production index shape

  /** Probe cells per query and ADC-candidate refine depth. */
  private val IvfPqProbe = 2
  private val IvfPqRefine = 10
  private val IvfPqK = 3

  /** q407: the COMPOSED production ANN index — IVF routing (q126's
    * coarse quantizer) over PQ compressed codes (q399's ADC scan) with
    * an exact re-rank, i.e. FAISS's IVFPQ shape (no-residual variant):
    *
    *   1. route: each query picks its [[IvfPqProbe]] nearest coarse
    *      cells from the driver-held k-means centroids (literal folds —
    *      no join, no shuffle);
    *   2. scan: ONLY those cells' PQ codes are ADC-scanned — the probe
    *      is an equi-join on the cell id, so at 100 TB the scan touches
    *      nprobe/k of the corpus and reads m-byte codes, not raw
    *      vectors; the per-query LUT ([[Subs]]×[[K]] doubles) rides
    *      along with the broadcast query set;
    *   3. refine: the top [[IvfPqRefine]] ADC candidates per query are
    *      re-ranked EXACTLY — a narrow equi-join of the bounded
    *      candidate list back to the raw vectors.
    *
    * Neither leg alone is what a production vector index runs; this is
    * both. Determinism: coarse fit and subspace codebooks are the
    * bit-exact [[KMeansLite]] replays (q115/q399 precedent), probe
    * selection and ADC distances are the same sequential folds on both
    * engines, all ranks tie-break on vec_id. */
  private val q407 = Q(
    "q407_ivfpq_search", {
      def d2s(v: String, cv: String) =
        s"""list_sum(list_transform(range(1, ${SubDim + 1}),
           |      i -> ($v[CAST(i AS INT)] - $cv[CAST(i AS INT)])
           |         * ($v[CAST(i AS INT)] - $cv[CAST(i AS INT)])))""".stripMargin
      val adist = (0 until Subs).map(m => d2s(s"q.q$m", s"k$m.cv"))
        .mkString("\n    + ")
      val dot = """list_sum(list_transform(range(1, 65),
                  |      i -> q.qv[CAST(i AS INT)] * n.v[CAST(i AS INT)]))"""
        .stripMargin
      s"""${VectorOps.kmeansOracleCtes(k = 8, iters = 3, dim = 64)},
         |${(0 until Subs).map(m => subspaceCtes(m)).mkString(",\n")},
         |codes AS (
         |  SELECT af0.vec_id,
         |    ${(0 until Subs).map(m => s"af$m.cell AS x$m").mkString(", ")}
         |  FROM af0 ${(1 until Subs).map(m => s"JOIN af$m USING (vec_id)").mkString(" ")}),
         |idx AS (
         |  SELECT n.vec_id, n.cell,
         |    ${(0 until Subs).map(m => s"x.x$m").mkString(", ")}
         |  FROM nn n JOIN codes x USING (vec_id)),
         |qs AS (
         |  SELECT q.vec_id AS qid, q.v AS qv, q.nrm AS qnrm,
         |    ${(0 until Subs).map(m =>
              s"q.v[${m * SubDim + 1}:${(m + 1) * SubDim}] AS q$m").mkString(", ")}
         |  FROM nn q WHERE q.vec_id < $AdcQueries),
         |qp AS (
         |  SELECT qid, pcell FROM (
         |    SELECT q.qid, c.cid AS pcell,
         |      ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
         |        list_sum(list_transform(range(1, 65),
         |          i -> (q.qv[CAST(i AS INT)] - c.cv[CAST(i AS INT)])
         |             * (q.qv[CAST(i AS INT)] - c.cv[CAST(i AS INT)]))), c.cid) AS prn
         |    FROM qs q CROSS JOIN c3 c) WHERE prn <= $IvfPqProbe),
         |cand AS (
         |  SELECT qid, nid FROM (
         |    SELECT q.qid, n.vec_id AS nid,
         |      ROW_NUMBER() OVER (PARTITION BY q.qid
         |        ORDER BY $adist, n.vec_id) AS arn
         |    FROM qs q JOIN qp p ON p.qid = q.qid
         |    JOIN idx n ON n.cell = p.pcell AND n.vec_id <> q.qid
         |    ${(0 until Subs).map(m =>
              s"JOIN c$m$Iters k$m ON k$m.cid = n.x$m").mkString("\n    ")})
         |  WHERE arn <= $IvfPqRefine)
         |SELECT qid, nid, cos_sim, rnk FROM (
         |  SELECT c.qid, c.nid,
         |    $dot / (q.qnrm * n.nrm) AS cos_sim,
         |    ROW_NUMBER() OVER (PARTITION BY c.qid
         |      ORDER BY $dot / (q.qnrm * n.nrm) DESC, c.nid) AS rnk
         |  FROM cand c JOIN qs q ON q.qid = c.qid
         |  JOIN nn n ON n.vec_id = c.nid)
         |WHERE rnk <= $IvfPqK ORDER BY qid, rnk""".stripMargin
    }) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val all = VectorOps.vecs(s, dir)
    // coarse quantizer: 8 cells, centroids are driver metadata
    val ivfCents = KMeansLite.fit(all, "vec_id", "v", k = 8, iters = 3)
    val cells = KMeansLite.assign(all, "v", ivfCents)
      .select(col("vec_id"), col("cell"))
    // PQ codebooks per subspace (no-residual: codes are independent of
    // the coarse assignment, so both fits replay independently)
    val fits = (0 until Subs).map { m =>
      val sub = all.select(col("vec_id"),
        expr(s"slice(v, ${m * SubDim + 1}, $SubDim)").as("sv"))
      (m, sub, KMeansLite.fit(sub, "vec_id", "sv", K, Iters))
    }
    // the index: one coarse cell + Subs byte-sized codes per vector —
    // at scale this is the ONLY table the scan reads
    val codes = fits.map { case (m, sub, cents) =>
      KMeansLite.assign(sub, "sv", cents)
        .select(col("vec_id"), col("cell").cast("int").as(s"c$m"))
    }.reduce(_.join(_, "vec_id"))
    val index = cells.join(codes, "vec_id")
    // query side: probe-cell routing from literal centroids (top-2 by
    // the same sequential d2 fold, ties to the lower cid via struct
    // sort) + the ADC LUT, both computed in one codegen projection
    val probeEntries = ivfCents.zipWithIndex.map { case (cv, i) =>
      struct(
        aggregate(
          zip_with(col("qv"), array(cv.map(lit(_)): _*),
            (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x).as("d2"),
        lit(i).as("cid"))
    }
    val lutEntries = for {
      (m, _, cents) <- fits
      cell <- 0 until K
    } yield aggregate(
      zip_with(
        slice(col("qv"), m * SubDim + 1, SubDim),
        array(cents(cell).map(lit(_)): _*),
        (a, b) => (a - b) * (a - b)),
      lit(0.0),
      (acc, x) => acc + x)
    val queries = all.filter(col("vec_id") < AdcQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qnrm"))
      .withColumn("lut", array(lutEntries: _*))
      .withColumn("probe",
        explode(slice(array_sort(array(probeEntries: _*)), 1, IvfPqProbe)))
      .select(col("qid"), col("qv"), col("qnrm"), col("lut"),
        col("probe.cid").as("pcell"))
    // ADC scan over ONLY the probed cells: an equi-join on the cell id
    // (each vector lives in exactly one cell — no duplicate candidates)
    val adist = (0 until Subs)
      .map(m => element_at(col("lut"), lit(m * K) + col(s"c$m") + 1))
      .reduce(_ + _)
    val aw = Window.partitionBy("qid").orderBy(col("adist"), col("vec_id"))
    val cand = index.join(broadcast(queries),
        col("cell") === col("pcell") && col("vec_id") =!= col("qid"))
      .withColumn("adist", adist)
      .withColumn("arn", row_number().over(aw))
      .filter(col("arn") <= IvfPqRefine)
      .select(col("qid"), col("vec_id").as("nid"), col("qv"), col("qnrm"))
    // exact re-rank of the bounded candidate list against raw vectors
    val rw = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("nid"))
    all.select(col("vec_id").as("nid"), col("v"), col("nrm"))
      .join(broadcast(cand), "nid")
      .withColumn("cos_sim",
        expr("graft_dot(qv, v)") / (col("qnrm") * col("nrm")))
      .withColumn("rnk", row_number().over(rw))
      .filter(col("rnk") <= IvfPqK)
      .select(col("qid"), col("nid"), col("cos_sim"),
        col("rnk").cast("long").as("rnk"))
      .orderBy("qid", "rnk")
  }

  // --------------------- q415: SQ8 scalar quantization + exact re-rank

  private val SqDim = Subs * SubDim // 64
  private val SqShortlist = 10
  private val SqK = 3

  /** q415: SCALAR quantization (SQ8) — the OTHER production vector
    * compression next to PQ (q399/q407): each dimension is linearly
    * mapped to an 8-bit code against per-dimension corpus min/max, so
    * a 64-dim float vector becomes 64 bytes (4× less IO than floats,
    * and the scan distance is PURE INTEGER arithmetic — SIMD-friendly
    * and bit-exact across engines, no LUT needed). The search is the
    * two-stage shape production SQ indexes run: (1) integer ADC scan
    * of the code table shortlists [[SqShortlist]] candidates per query
    * (bounded query set broadcast — the q233 eval-set contract),
    * (2) the shortlist re-ranks EXACTLY against raw vectors via one
    * narrow equi-join. Determinism: per-dim min/max are exact aggregate
    * bounds; the quantization formula `floor((x−mn)·255/span)` runs the
    * same IEEE ops in the same order on both engines; code distances
    * are integers; the exact re-rank is the established sequential-fold
    * double (ties on vec_id). A zero span (constant dimension) maps to
    * code 0 via a span-1 substitute, not a 0/0. */
  private val q415 = Q(
    "q415_sq8_scalar_quantization", {
      val qexpr =
        s"""list_transform(range(1, ${SqDim + 1}),
           |    i -> CAST(least(greatest(floor(
           |      (v[CAST(i AS INT)] - mns[CAST(i AS INT)]) * 255.0
           |        / sps[CAST(i AS INT)]), 0.0), 255.0) AS BIGINT))""".stripMargin
      val idist =
        s"""list_sum(list_transform(range(1, ${SqDim + 1}),
           |      i -> (q.qc[CAST(i AS INT)] - d.c[CAST(i AS INT)])
           |         * (q.qc[CAST(i AS INT)] - d.c[CAST(i AS INT)])))""".stripMargin
      val d2 =
        s"""list_sum(list_transform(range(1, ${SqDim + 1}),
           |      i -> (q.qv[CAST(i AS INT)] - n.v[CAST(i AS INT)])
           |         * (q.qv[CAST(i AS INT)] - n.v[CAST(i AS INT)])))""".stripMargin
      s"""WITH v AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |st AS (
         |  SELECT i, min(v[CAST(i AS INT)]) AS mn, max(v[CAST(i AS INT)]) AS mx
         |  FROM v CROSS JOIN range(1, ${SqDim + 1}) t(i) GROUP BY i),
         |stl AS (
         |  SELECT list(mn ORDER BY i) AS mns,
         |    list(CASE WHEN mx > mn THEN mx - mn ELSE 1.0 END ORDER BY i) AS sps
         |  FROM st),
         |codes AS (
         |  SELECT vec_id, $qexpr AS c
         |  FROM v CROSS JOIN stl),
         |qs AS (SELECT vec_id AS qid, c AS qc FROM codes WHERE vec_id < $AdcQueries),
         |short AS (
         |  SELECT qid, nid, idist FROM (
         |    SELECT q.qid, d.vec_id AS nid,
         |      $idist AS idist,
         |      ROW_NUMBER() OVER (PARTITION BY q.qid
         |        ORDER BY $idist, d.vec_id) AS srn
         |    FROM qs q JOIN codes d ON d.vec_id <> q.qid)
         |  WHERE srn <= $SqShortlist),
         |qv AS (SELECT vec_id AS qid, v AS qv FROM v WHERE vec_id < $AdcQueries)
         |SELECT qid, nid, idist, rnk FROM (
         |  SELECT s.qid, s.nid, CAST(s.idist AS BIGINT) AS idist,
         |    ROW_NUMBER() OVER (PARTITION BY s.qid
         |      ORDER BY $d2, s.nid) AS rnk
         |  FROM short s JOIN qv q ON q.qid = s.qid
         |  JOIN v n ON n.vec_id = s.nid)
         |WHERE rnk <= $SqK ORDER BY qid, rnk""".stripMargin
    }) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val all = VectorOps.vecs(s, dir)
    // per-dimension corpus bounds: ONE partial-aggregated pass emitting
    // 2×64 doubles of driver metadata (no explode, no shuffle of rows)
    val boundsRow = all.agg(
      array((1 to SqDim).map(i => min(element_at(col("v"), i))): _*).as("mns"),
      array((1 to SqDim).map(i => max(element_at(col("v"), i))): _*).as("mxs"))
      .first()
    val mns = boundsRow.getSeq[Double](0)
    val sps = boundsRow.getSeq[Double](1).zip(mns)
      .map { case (mx, mn) => if (mx > mn) mx - mn else 1.0 }
    val mnA = array(mns.map(lit): _*)
    val spA = array(sps.map(lit): _*)
    // The code table: 64 single-byte-range values per vector (production
    // packs them into one BinaryType word; the arithmetic is identical).
    // Codes are stored as array<double> so the scan distance can run
    // through the CODEGEN graft_dot instead of interpreted HOF lambdas:
    // ‖q−d‖² = q·q + d·d − 2·q·d, and with every component an integer
    // ≤ 255 all three dot products are exact integers < 2^53 — the
    // identity reproduces the oracle's direct Σ(q−d)² bit-for-bit.
    val codes = all.select(col("vec_id"),
      transform(sequence(lit(1), lit(SqDim)), i =>
        least(greatest(floor(
          (element_at(col("v"), i) - element_at(mnA, i)) * lit(255.0) /
            element_at(spA, i)), lit(0.0)), lit(255.0))).as("c"))
      .withColumn("n2", expr("graft_dot(c, c)"))
    val qs = codes.filter(col("vec_id") < AdcQueries)
      .select(col("vec_id").as("qid"), col("c").as("qc"),
        col("n2").as("qn2"))
    // stage 1: integer ADC scan — broadcast bounded queries against the
    // code table, one linear codegen pass, top-10 shortlist per query
    val idist = (col("qn2") + col("n2") -
      lit(2.0) * expr("graft_dot(qc, c)")).cast("long")
    val sw = Window.partitionBy("qid").orderBy(col("idist"), col("vec_id"))
    val short = codes.join(broadcast(qs), col("vec_id") =!= col("qid"))
      .withColumn("idist", idist)
      .withColumn("srn", row_number().over(sw))
      .filter(col("srn") <= SqShortlist)
      .select(col("qid"), col("vec_id").as("nid"), col("idist"))
    // stage 2: exact re-rank of the bounded shortlist on raw vectors
    val qv = all.filter(col("vec_id") < AdcQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val rw = Window.partitionBy("qid").orderBy(col("d2"), col("nid"))
    all.select(col("vec_id").as("nid"), col("v"))
      .join(broadcast(short.join(qv, "qid")), "nid")
      .withColumn("d2", aggregate(
        zip_with(col("qv"), col("v"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("rnk", row_number().over(rw))
      .filter(col("rnk") <= SqK)
      .select(col("qid"), col("nid"), col("idist").cast("long").as("idist"),
        col("rnk").cast("long").as("rnk"))
      .orderBy("qid", "rnk")
  }

  // ------------- q421: cluster-balanced corpus sampling

  /** q421: DIVERSITY-BALANCED downsampling by embedding cluster — the
    * semantic twin of q416's language-mixture sampler (and the
    * selection stage SemDeDup-style pipelines run after clustering):
    * vectors route to k-means cells (the bit-exact q115 fit — driver
    * centroids, one codegen map-side assign), and every cell gets the
    * SAME admission budget (total/4 ÷ k), so dominant content clusters
    * are downsampled while small ones survive whole — the corpus keeps
    * its semantic spread at a quarter of the size. Admission is a
    * deterministic LCG order per cell (both engines replay the exact
    * selection); sum(vec_id) fingerprints it. One fit + one assign +
    * one per-cell window — linear, no pair joins, nothing corpus-sized
    * on the driver. */
  private val q421 = Q(
    "q421_cluster_balanced_sampling", {
      s"""${VectorOps.kmeansOracleCtes(k = 8, iters = 3, dim = 64)},
         |tot AS (SELECT count(*) AS n FROM vv),
         |ranked AS (
         |  SELECT cell, vec_id,
         |    ROW_NUMBER() OVER (PARTITION BY cell
         |      ORDER BY (vec_id * 1103515245 + 12345) % 2147483647, vec_id)
         |      AS rn
         |  FROM af)
         |SELECT CAST(r.cell AS BIGINT) AS cell,
         |  CAST(count(*) AS BIGINT) AS n_cell,
         |  CAST(sum(CASE WHEN r.rn <= (t.n // 4) // 8 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_sel,
         |  CAST(sum(CASE WHEN r.rn <= (t.n // 4) // 8 THEN r.vec_id ELSE 0 END)
         |    AS BIGINT) AS sel_fingerprint
         |FROM ranked r CROSS JOIN tot t
         |GROUP BY r.cell ORDER BY r.cell""".stripMargin
    }) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val all = VectorOps.vecs(s, dir)
    val cents = KMeansLite.fit(all, "vec_id", "v", k = 8, iters = 3)
    val cells = KMeansLite.assign(all, "v", cents)
      .select(col("vec_id"), col("cell"))
    val tot = cells.agg(count(lit(1)).as("n"))
    val ranked = cells
      .withColumn("h", (col("vec_id") * 1103515245L + 12345L) % 2147483647L)
      .withColumn("rn", row_number().over(
        Window.partitionBy("cell").orderBy(col("h"), col("vec_id"))))
      .crossJoin(broadcast(tot))
      .withColumn("b", expr("(n div 4) div 8"))
    ranked.groupBy(col("cell").cast("long").as("cell"))
      .agg(count(lit(1)).cast("long").as("n_cell"),
        sum(when(col("rn") <= col("b"), 1L).otherwise(0L)).cast("long")
          .as("n_sel"),
        sum(when(col("rn") <= col("b"), col("vec_id")).otherwise(0L))
          .cast("long").as("sel_fingerprint"))
      .orderBy("cell")
  }

  // --------------------- q427: graph-based ANN (HNSW-family)

  /** Graph parameters: [[GK]] coarse cells ([[KMeansLite]], the exact
    * q115 fit), sorted-neighborhood window [[GS]] for seed-edge
    * candidates, out-degree [[GD]], [[GR]] NN-descent refinement
    * rounds, beam width [[GW]], [[GT]] fixed search rounds, queries
    * vec_id < [[GQ]], final top-[[GTop]]. */
  private val GK = 8; private val GIters = 3
  private val GS = 8; private val GD = 8; private val GR = 2
  private val GW = 16; private val GT = 4
  private val GQ = 50; private val GTop = 3

  /** q427: the one production ANN shape the library lacked next to IVF
    * (q49/q115/q126), PQ (q399/q402/q407), SQ8 (q415) and LSH (q139) —
    * a GRAPH index with beam search (the HNSW/DiskANN family),
    * re-expressed deterministically so the oracle replays the build
    * and the search bit-for-bit:
    *
    *  - BUILD (cluster-seeded + NN-descent, linear — never all-pairs):
    *    vectors are assigned to [[GK]] k-means cells (the bit-exact
    *    [[KMeansLite]] fit q115's oracle already replays); within each
    *    cell, nodes are ordered by distance-to-centroid and each
    *    node's SEED edges are the top-[[GD]] by true cosine of its
    *    ±[[GS]] window in that order (q323's sorted-neighborhood move
    *    — O(n·S), not O(n²/k)). [[GR]] NN-DESCENT rounds then refine:
    *    each round's candidates are the undirected 2-hop neighborhood
    *    (neighbors and neighbors-of-neighbors, both edge directions —
    *    the Dong et al. NN-descent step), re-ranked by true cosine,
    *    top-[[GD]] kept. Candidate volume per round is n·(2·GD)² —
    *    linear in n, and the FIXED round count keeps it
    *    oracle-unrollable. Each cell's rank-1 node is its HUB: the
    *    entry-point set (k node ids of driver metadata).
    *  - SEARCH (beam, [[GT]] FIXED rounds — fixed so the oracle can
    *    unroll it): the beam starts as the hubs plus the query node
    *    itself (in-corpus queries, the q49/q233 eval contract) scored
    *    against the query, then each round expands all out-edges of
    *    the beam, re-scores, and keeps the top-[[GW]] of beam ∪
    *    expansions (ties on vec_id). After T rounds the answer is the
    *    beam's top-[[GTop]] excluding the query itself.
    *
    * 100 TB shape: the build is one assignment pass + one rank window
    * + one bucketed window join + GR bounded self-joins of a
    * degree-bounded edge list (every stage linear, shuffles keyed by
    * cell/src); the search is T bounded joins whose left side is
    * query×beam-sized, never corpus-sized. Recall@3 >= the single-cell
    * IVF probe is pinned by spec (beam search crosses cells through
    * the hub entry points; IVF can't leave its cell). */
  private val q427 = Q(
    "q427_graph_ann_beam", {
      val dim = 64
      def cos(qv: String, qn: String, nv: String, nn: String) =
        s"""(list_sum(list_transform(range(1, ${dim + 1}),
           |    i -> $qv[CAST(i AS INT)] * $nv[CAST(i AS INT)])) / ($qn * $nn))""".stripMargin
      def d2(v: String, cv: String) =
        s"""list_sum(list_transform(range(1, ${dim + 1}),
           |    i -> ($v[CAST(i AS INT)] - $cv[CAST(i AS INT)])
           |       * ($v[CAST(i AS INT)] - $cv[CAST(i AS INT)])))""".stripMargin
      def beamCte(t: Int) =
        s"""ex$t AS MATERIALIZED (
           |  SELECT DISTINCT qid, nid FROM (
           |    SELECT b.qid, e.dst AS nid
           |    FROM b${t - 1} b JOIN edges e ON e.src = b.nid
           |    UNION ALL SELECT qid, nid FROM b${t - 1})),
           |b$t AS MATERIALIZED (
           |  SELECT qid, nid, cs FROM (
           |    SELECT qid, nid, cs,
           |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cs DESC, nid) AS rn
           |    FROM (SELECT x.qid, x.nid,
           |            ${cos("q.qv", "q.qnrm", "n.v", "n.nrm")} AS cs
           |          FROM ex$t x JOIN qs q ON q.qid = x.qid
           |          JOIN nnm n ON n.vec_id = x.nid)) WHERE rn <= $GW)""".stripMargin
      def descentCte(r: Int) =
        s"""und$r AS MATERIALIZED (
           |  SELECT DISTINCT src, dst FROM (
           |    SELECT src, dst FROM e${r - 1}
           |    UNION ALL SELECT dst AS src, src AS dst FROM e${r - 1})),
           |e$r AS MATERIALIZED (
           |  SELECT src, dst FROM (
           |    SELECT src, dst,
           |      ROW_NUMBER() OVER (PARTITION BY src ORDER BY csim DESC, dst) AS rn
           |    FROM (SELECT c.src, c.dst,
           |            ${cos("a.v", "a.nrm", "b.v", "b.nrm")} AS csim
           |          FROM (SELECT DISTINCT u1.src, u2.dst
           |                FROM und$r u1 JOIN und$r u2 ON u2.src = u1.dst
           |                WHERE u2.dst <> u1.src
           |                UNION SELECT src, dst FROM und$r) c
           |          JOIN nnm a ON a.vec_id = c.src
           |          JOIN nnm b ON b.vec_id = c.dst)) WHERE rn <= $GD)""".stripMargin
      s"""${VectorOps.kmeansOracleCtes(GK, GIters, dim)},
         |nnm AS MATERIALIZED (SELECT vec_id, v, cell, nrm FROM nn),
         |rk AS MATERIALIZED (
         |  SELECT vec_id, v, cell, nrm,
         |    ROW_NUMBER() OVER (PARTITION BY cell ORDER BY d2c, vec_id) AS rk
         |  FROM (SELECT n.vec_id, n.v, n.cell, n.nrm, ${d2("n.v", "c.cv")} AS d2c
         |        FROM nnm n JOIN c$GIters c ON c.cid = n.cell)),
         |cand AS MATERIALIZED (
         |  SELECT a.vec_id AS src, b.vec_id AS dst,
         |    ${cos("a.v", "a.nrm", "b.v", "b.nrm")} AS csim
         |  FROM rk a JOIN rk b ON a.cell = b.cell AND a.vec_id <> b.vec_id
         |    AND abs(a.rk - b.rk) <= $GS),
         |e0 AS MATERIALIZED (
         |  SELECT src, dst FROM (
         |    SELECT src, dst,
         |      ROW_NUMBER() OVER (PARTITION BY src ORDER BY csim DESC, dst) AS rn
         |    FROM cand) WHERE rn <= $GD),
         |${(1 to GR).map(descentCte).mkString(",\n")},
         |edges AS MATERIALIZED (SELECT src, dst FROM e$GR),
         |hubs AS MATERIALIZED (SELECT vec_id FROM rk WHERE rk = 1),
         |qs AS MATERIALIZED (SELECT vec_id AS qid, v AS qv, nrm AS qnrm FROM nnm
         |       WHERE vec_id < $GQ),
         |b0 AS MATERIALIZED (
         |  SELECT qid, nid, cs FROM (
         |    SELECT qid, nid, cs,
         |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cs DESC, nid) AS rn
         |    FROM (SELECT s.qid, s.nid,
         |            ${cos("q.qv", "q.qnrm", "n.v", "n.nrm")} AS cs
         |          FROM (SELECT q0.qid, h.vec_id AS nid
         |                FROM qs q0 CROSS JOIN hubs h
         |                UNION SELECT qid, qid AS nid FROM qs) s
         |          JOIN qs q ON q.qid = s.qid
         |          JOIN nnm n ON n.vec_id = s.nid)) WHERE rn <= $GW),
         |${(1 to GT).map(beamCte).mkString(",\n")}
         |SELECT qid, nid, cs AS cos_sim, CAST(rnk AS BIGINT) AS rnk FROM (
         |  SELECT qid, nid, cs,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cs DESC, nid) AS rnk
         |  FROM b$GT WHERE nid <> qid)
         |WHERE rnk <= $GTop ORDER BY qid, rnk""".stripMargin
    }) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val all = VectorOps.vecs(s, dir) // vec_id, label, v, nrm
    val cents = KMeansLite.fit(all, "vec_id", "v", GK, GIters)
    val centDf = broadcast(s.createDataFrame(
      s.sparkContext.parallelize(cents.zipWithIndex.map {
        case (cv, i) => org.apache.spark.sql.Row(i, cv.toSeq) }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("cv",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType))))))
    // rank within cell by distance-to-centroid (the same sequential
    // (a-b)^2 fold as the assignment — bit-exact vs list_sum)
    val ranked = KMeansLite.assign(all, "v", cents)
      .join(centDf, "cell")
      .withColumn("d2c",
        expr("""aggregate(sequence(1, 64), CAST(0 AS DOUBLE),
               |  (acc, i) -> acc + (element_at(v, i) - element_at(cv, i))
               |            * (element_at(v, i) - element_at(cv, i)))""".stripMargin))
      .withColumn("rk", row_number().over(
        Window.partitionBy("cell").orderBy(col("d2c"), col("vec_id"))))
      .select("vec_id", "v", "nrm", "cell", "rk")
    // sorted-neighborhood edge candidates via rank-bucket equi-join
    // (bin-and-refine: |rk - drk| <= GS implies adjacent GS-buckets)
    val left = ranked.withColumn("bkt", expr(s"CAST((rk - 1) div $GS AS INT)"))
    val right = ranked.select(col("cell").as("dcell"),
      col("vec_id").as("dst"), col("v").as("dv"), col("nrm").as("dnrm"),
      col("rk").as("drk"))
      .withColumn("dbkt", expr(s"CAST((drk - 1) div $GS AS INT)"))
    val cand = left.join(right,
      col("cell") === col("dcell") &&
        col("dbkt").between(col("bkt") - 1, col("bkt") + 1) &&
        abs(col("rk") - col("drk")) <= GS && col("vec_id") =!= col("dst"))
      .withColumn("csim", expr("graft_dot(v, dv)") / (col("nrm") * col("dnrm")))
    val wSrc = Window.partitionBy("src").orderBy(col("csim").desc, col("dst"))
    def topD(scored: DataFrame): DataFrame = scored
      .withColumn("rn", row_number().over(wSrc))
      .filter(col("rn") <= GD).select("src", "dst")
    val nnDf = all.select(col("vec_id").as("nid"), col("v").as("nv"),
      col("nrm").as("nnrm"))
    var edges = topD(cand.select(col("vec_id").as("src"), col("dst"),
      col("csim"))).localCheckpoint()
    // NN-descent: candidates = undirected 1- and 2-hop neighborhood,
    // re-ranked by true cosine, top-D kept — GR fixed rounds
    for (_ <- 1 to GR) {
      val und = edges.union(edges.select(col("dst").as("src"),
        col("src").as("dst"))).distinct().localCheckpoint()
      val hop2 = und.select(col("src"), col("dst").as("mid"))
        .join(und.select(col("src").as("mid"), col("dst")), "mid")
        .filter(col("dst") =!= col("src")).select("src", "dst")
      val cands = hop2.union(und.select("src", "dst")).distinct()
      val scored = cands
        .join(nnDf.select(col("nid").as("src"), col("nv").as("av"),
          col("nnrm").as("anrm")), "src")
        .join(nnDf.select(col("nid").as("dst"), col("nv").as("bv"),
          col("nnrm").as("bnrm")), "dst")
        .withColumn("csim",
          expr("graft_dot(av, bv)") / (col("anrm") * col("bnrm")))
      edges = topD(scored.select("src", "dst", "csim")).localCheckpoint()
    }
    val hubs = ranked.filter(col("rk") === 1).select(col("vec_id").as("nid"))
    val qDf = all.filter(col("vec_id") < GQ)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qnrm")).localCheckpoint()
    val w = Window.partitionBy("qid").orderBy(col("cs").desc, col("nid"))
    def score(pairs: DataFrame): DataFrame = pairs
      .join(qDf, "qid").join(nnDf, "nid")
      .withColumn("cs", expr("graft_dot(qv, nv)") / (col("qnrm") * col("nnrm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= GW).select("qid", "nid", "cs")
    // entry points: the hubs plus the query node itself (in-corpus
    // queries — the q49/q233 eval contract)
    var beam = score(
      qDf.select("qid").crossJoin(broadcast(hubs))
        .union(qDf.select(col("qid"), col("qid").as("nid"))).distinct())
      .localCheckpoint()
    for (_ <- 1 to GT) {
      val expanded = beam.select("qid", "nid")
        .join(edges, col("nid") === col("src"))
        .select(col("qid"), col("dst").as("nid"))
        .union(beam.select("qid", "nid"))
        .distinct()
      beam = score(expanded).localCheckpoint()
    }
    beam.filter(col("nid") =!= col("qid"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= GTop)
      .select(col("qid"), col("nid"), col("cs").as("cos_sim"),
        col("rnk").cast("long").as("rnk"))
      .orderBy("qid", "rnk")
  }

  val defs: Seq[Q] = Seq(q223, q233, q399, q402, q405, q407, q415, q421,
    q427)
}
