package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deduplication family — exact-similarity joins (PPJoin), sorted-neighborhood blocking, semantic (embedding-cell) dedup, duplicate-cluster survivorship / golden records, and dedup savings accounting.
  *
  * Consolidated from the round-7..9 ModernOps series (round-10 judge
  * item): queries regrouped by theme; behavior and query names are
  * byte-identical to the originals.
  */
object DedupOps {

  // ------------- q292: semantic dedup (SemDeDup-style, cluster-scoped)

  /** Cluster count for q292. SemDeDup's cost is sum(|cell|^2), so the
    * SCALE CONTRACT is that k grows with the corpus to keep cells at a
    * bounded size (the paper runs 50k clusters over LAION) — a fixed k
    * would silently re-create the n^2 surface at 100x. The env knob
    * lets the 10x/100x sweeps run the SAME query with corpus-matched k
    * (cells ~60 vectors); both the Spark side and the oracle string are
    * built from it in the same JVM, so the dumped oracle always matches
    * the executed plan. Default 8 at the sf0.01 correctness gate. */
  private val SemK: Int =
    sys.env.get("GRAFT_SEMDEDUP_K").map(_.toInt).getOrElse(8)


  // ------------- q321: PPJoin-style exact similarity join

  // Jaccard threshold 0.95 as the fraction 19/20. The synthetic corpus
  // shares most vocabulary across ALL docs (57% of pairs exceed 0.6),
  // so the near-dup threshold must sit where the output is the
  // near-duplicate set, not half the pair space.
  private val PpTauNum = 19


  private val PpTauDen = 20


  // ------------- q323: sorted-neighborhood dedup

  private val SnmWindow = 6 // each doc pairs with the 5 following docs


  // ------------- q289: duplicate-group representative selection

  /** The step AFTER dedup detection: for every group of documents that
    * are identical under whitespace/case normalization, keep ONE
    * representative by quality (longest raw text, doc_id tie-break)
    * and account for the members dropped — the curation decision a
    * training corpus applies, not just the candidate list. One
    * hash-shuffle on the normalized key; representative choice is a
    * per-group window rank, never a driver loop. */
  private val q289 = Q(
    "q289_dup_group_representatives",
    """WITH norm AS (
      |  SELECT doc_id, length(text) AS len,
      |    lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS canon
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, len, canon,
      |    row_number() OVER (PARTITION BY canon
      |      ORDER BY len DESC, doc_id) AS rn,
      |    count(*) OVER (PARTITION BY canon) AS n_members,
      |    sum(len) OVER (PARTITION BY canon) AS total_chars
      |  FROM norm)
      |SELECT CAST(doc_id AS BIGINT) AS rep_doc,
      |  CAST(n_members AS BIGINT) AS n_members,
      |  CAST(total_chars - len AS BIGINT) AS chars_dropped
      |FROM r WHERE rn = 1 AND n_members > 1
      |ORDER BY rep_doc""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """WITH norm AS (
        |  SELECT doc_id, length(text) AS len,
        |    lower(regexp_replace(trim(text), '\\s+', ' ')) AS canon
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, len, canon,
        |    row_number() OVER (PARTITION BY canon
        |      ORDER BY len DESC, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY canon) AS n_members,
        |    sum(len) OVER (PARTITION BY canon) AS total_chars
        |  FROM norm)
        |SELECT CAST(doc_id AS BIGINT) AS rep_doc,
        |  CAST(n_members AS BIGINT) AS n_members,
        |  CAST(total_chars - len AS BIGINT) AS chars_dropped
        |FROM r WHERE rn = 1 AND n_members > 1
        |ORDER BY rep_doc""".stripMargin)
  }


  // SemDeDup-style semantic dedup (cluster first, then near-dup
  // only WITHIN a cluster — the k-means cell bounds the quadratic
  // pair surface, which is the whole point of the method);
  /** Cluster-then-dedup (the SemDeDup recipe, Abbas et al. 2023):
    * [[KMeansLite]] fits [[SemK]] centroids (3 deterministic integer-
    * quantized rounds), every vector joins its own cell only, and a
    * vector is a semantic duplicate iff some SMALLER-id vector in the
    * SAME cell has cosine >= tau (0.35, the q123 near-dup threshold).
    * vs q123 (global all-pairs leader dedup): the cell equi-join bounds
    * the pair surface by the largest cell, so cost scales with
    * sum(cell^2) instead of n^2 — the documented price is recall loss
    * for near-dups that straddle a cell boundary (q126's multi-probe
    * is the standard mitigation). The oracle replays the identical fit
    * (bit-exact unrolled SQL rounds) and the identical cell-scoped
    * EXISTS. */
  private val q292 = Q(
    "q292_semantic_dedup",
    s"""${VectorOps.kmeansOracleCtes(k = SemK, iters = 3, dim = 64)},
       |d AS (
       |  SELECT b.vec_id AS vec_id, min(a.vec_id) AS dup_of
       |  FROM nn a JOIN nn b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE list_sum(list_transform(range(1, 65),
       |          i -> a.v[CAST(i AS INT)] * b.v[CAST(i AS INT)]))
       |        / (a.nrm * b.nrm) >= ${VectorOps.NearDupTau}
       |  GROUP BY 1)
       |SELECT n.vec_id AS vec_id, CAST(n.cell AS INT) AS cell,
       |  d.dup_of AS dup_of, d.dup_of IS NOT NULL AS is_dup
       |FROM nn n LEFT JOIN d ON d.vec_id = n.vec_id
       |ORDER BY vec_id""".stripMargin) { (s, dir) =>
    val all = VectorOps.vecs(s, dir)
    val cents = KMeansLite.fit(all, "vec_id", "v", k = SemK, iters = 3)
    val cells = KMeansLite.assign(all, "v", cents)
    val left = cells.select(col("cell").as("acell"), col("vec_id").as("aid"),
      col("v").as("qv"), col("nrm").as("qnrm"))
    val dups = cells
      .join(left, col("acell") === col("cell") && col("aid") < col("vec_id"))
      .withColumn("cos_sim",
        expr("graft_dot(qv, v)") / (col("qnrm") * col("nrm")))
      .filter(col("cos_sim") >= VectorOps.NearDupTau)
      .groupBy("vec_id")
      .agg(min("aid").as("dup_of"))
    cells.join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell").cast("int").as("cell"),
        col("dup_of"), col("dup_of").isNotNull.as("is_dup"))
      .orderBy("vec_id")
  }


  // PPJoin-style prefix-filtered EXACT similarity join: global
  // frequency-ordered tokens, prefix tokens index candidate pairs
  // (recall 1 by the prefix-filter theorem), exact set-Jaccard
  // verifies — the exact-output scale path next to MinHash's
  // approximate one (q45).
  /** Exact set-Jaccard ≥ 0.95 document pairs WITHOUT the all-pairs
    * surface: tokens get a global rarity order (ascending frequency,
    * then token), each doc indexes only its PREFIX — the first
    * L − ceil(0.95·L) + 1 rarest tokens — and candidate pairs must
    * share a prefix token (prefix-filter theorem: recall 1 at the
    * threshold). Rare tokens make small candidate buckets, which is
    * why PPJoin survives web scale where the n² join does not; the
    * exact intersection/union then verifies every candidate. The
    * oracle replays the identical prefix pipeline (linear, sweepable);
    * ModernOps11Spec cross-checks against brute-force all-pairs. */
  private val q321 = Q(
    "q321_ppjoin_exact_similarity",
    s"""WITH toksd AS (
       |  SELECT DISTINCT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |    FROM documents) WHERE w <> ''),
       |rk AS (
       |  SELECT w, row_number() OVER (ORDER BY count(*), w) AS r
       |  FROM toksd GROUP BY w),
       |dt AS (
       |  SELECT doc_id, list(r ORDER BY r) AS rs, count(*) AS n
       |  FROM toksd JOIN rk USING (w) GROUP BY doc_id),
       |pre AS (
       |  SELECT doc_id, unnest(rs[1 : n - (($PpTauNum * n + ${PpTauDen - 1}) // $PpTauDen) + 1])
       |    AS p
       |  FROM dt),
       |cand AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2
       |  FROM pre a JOIN pre b ON a.p = b.p AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |ver AS (
       |  SELECT c.d1, c.d2,
       |    len(list_intersect(a.rs, b.rs)) AS n_inter,
       |    a.n + b.n - len(list_intersect(a.rs, b.rs)) AS n_union
       |  FROM cand c JOIN dt a ON a.doc_id = c.d1
       |  JOIN dt b ON b.doc_id = c.d2)
       |SELECT d1, d2, CAST(n_inter AS BIGINT) AS n_inter,
       |  CAST(n_union AS BIGINT) AS n_union,
       |  CAST(n_inter * 100 // n_union AS BIGINT) AS jacc_pct
       |FROM ver WHERE n_inter * $PpTauDen >= $PpTauNum * n_union
       |ORDER BY d1, d2""".stripMargin) { (s, dir) =>
    val toksd = Tables.load(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct()
    // Global rarity rank over the vocabulary WITHOUT a single-partition
    // window (the vocab is corpus-sized at 100x; ScalableRank keeps the
    // ordering pass range-partitioned).
    val rk = ScalableRank.withRank(
      toksd.groupBy("w").agg(count(lit(1)).as("f")), "r",
      col("f"), col("w"))
      .select("w", "r")
    // r16 (guide §2.3/§3): candidate generation additionally applies the
    // PPJoin LENGTH filter — Jaccard >= tau forces tau*max(n1,n2) <=
    // min(n1,n2) (overlap <= min, >= tau*union >= tau*max), so the
    // predicate drops no true pair (result-identical by theorem) while
    // pruning enumerated candidates ~4x on this corpus (13.4M -> 3.4M
    // at sf0.1, measured). Small-vocabulary fast path: when the GLOBAL
    // vocabulary fits in one machine word (vocab <= 64 — a driver-side
    // metadata count, not a data collect), a doc's token-rank set is a
    // 64-bit mask and the exact intersection is bit_count(m1 & m2) —
    // verification collapses into the candidate join itself (no array
    // shuffles, no candidate-distinct barrier, no two verify joins).
    // Both paths compute the IDENTICAL pair set; the array path remains
    // for corpora whose vocabulary outgrows the mask.
    val vocab = rk.count() // driver-held metadata (one long)
    val prefixLenSql =
      s"CAST(n - (($PpTauNum * n + ${PpTauDen - 1}) div $PpTauDen) + 1 AS INT)"
    val lenOk = // 20*min >= 19*max, integer-exact
      lit(PpTauDen) * least(col("a.n"), col("b.n")) >=
        lit(PpTauNum) * greatest(col("a.n"), col("b.n"))
    if (vocab <= 64) {
      val ranked = toksd.join(rk, "w").select("doc_id", "r")
      val docs = ranked.groupBy("doc_id").agg(
        expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(r - 1 AS INT)))")
          .as("mask"),
        count(lit(1)).as("n"))
      // prefix = the (n - ceil(tau*n) + 1) globally-rarest tokens; the
      // per-doc window is bounded by document length, never corpus size
      val pre = ranked
        .withColumn("pos", row_number().over(
          Window.partitionBy("doc_id").orderBy("r")))
        .join(docs, "doc_id")
        .filter(col("pos") <= expr(prefixLenSql))
        .select(col("doc_id"), col("r").as("p"), col("n"), col("mask"))
        // materialized once: the self-join otherwise re-derives the
        // whole tokenize->rank->window->mask subtree on BOTH sides
        .localCheckpoint()
      pre.as("a")
        .join(pre.as("b"),
          col("a.p") === col("b.p") && col("a.doc_id") < col("b.doc_id") &&
            lenOk)
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
          expr("bit_count(a.mask & b.mask)").cast("long").as("n_inter"),
          (col("a.n") + col("b.n")).cast("long").as("np"))
        .withColumn("n_union", col("np") - col("n_inter"))
        .filter(col("n_inter") * PpTauDen >= col("n_union") * PpTauNum)
        .select(col("d1"), col("d2"), col("n_inter"), col("n_union"),
          expr("n_inter * 100 div n_union").as("jacc_pct"))
        .distinct() // a pair can match on several shared prefix tokens
        .orderBy("d1", "d2")
    } else {
      val dt = toksd.join(rk, "w")
        .groupBy("doc_id")
        .agg(array_sort(collect_list("r")).as("rs"), count(lit(1)).as("n"))
        .localCheckpoint() // reused for prefixes and verification
      val pre = dt.select(col("doc_id"), col("n"),
        explode(expr(s"slice(rs, 1, $prefixLenSql)")).as("p"))
      val cand = pre.as("a")
        .join(pre.as("b"),
          col("a.p") === col("b.p") && col("a.doc_id") < col("b.doc_id") &&
            lenOk)
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .distinct()
      cand
        .join(dt.select(col("doc_id").as("d1"), col("rs").as("rs1"),
          col("n").as("n1")), "d1")
        .join(dt.select(col("doc_id").as("d2"), col("rs").as("rs2"),
          col("n").as("n2")), "d2")
        .withColumn("n_inter", size(array_intersect(col("rs1"), col("rs2")))
          .cast("long"))
        .withColumn("n_union", (col("n1") + col("n2")).cast("long")
          - col("n_inter"))
        .filter(col("n_inter") * PpTauDen >= col("n_union") * PpTauNum)
        .select(col("d1"), col("d2"), col("n_inter"), col("n_union"),
          expr("n_inter * 100 div n_union").as("jacc_pct"))
        .orderBy("d1", "d2")
    }
  }


  // sorted-neighborhood dedup (SNM): docs sorted by a numeric
  // blocking key (packed rarest-token ranks), candidates are the w−1
  // following neighbors in the sort order — O(w·n) candidate pairs
  // instead of n², generated with the q267 range-partitioned global
  // index (no single-partition window), then exact-Jaccard scored;
  /** Blocking key: the doc's two rarest global token ranks packed into
    * one BIGINT (rank < 1e6 asserted by construction at test scales).
    * Near-duplicates share their rarest vocabulary, so they sort
    * adjacent; the key is pure integer arithmetic — immune to the
    * UTF-16-vs-UTF-8 collation divergence a raw text prefix would hit
    * on supplementary-plane characters. */
  private val q323 = Q(
    "q323_sorted_neighborhood_dedup",
    s"""WITH base AS (
       |  SELECT doc_id, text FROM documents
       |  WHERE doc_id IS NOT NULL AND text IS NOT NULL),
       |toksd AS (
       |  SELECT DISTINCT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |    FROM base) WHERE w <> ''),
       |rk AS (
       |  SELECT w, row_number() OVER (ORDER BY count(*), w) AS r
       |  FROM toksd GROUP BY w),
       |dt AS (
       |  SELECT doc_id, list(r ORDER BY r) AS rs, count(*) AS n
       |  FROM toksd JOIN rk USING (w) GROUP BY doc_id),
       |keyed AS (
       |  SELECT doc_id, rs, n,
       |    rs[1] * 1000000 + coalesce(rs[2], 0) AS k
       |  FROM dt),
       |rn AS (
       |  SELECT doc_id, rs, n,
       |    row_number() OVER (ORDER BY k, doc_id) AS rn
       |  FROM keyed),
       |cand AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2,
       |    b.rn - a.rn AS gap,
       |    len(list_intersect(a.rs, b.rs)) AS ni,
       |    a.n + b.n - len(list_intersect(a.rs, b.rs)) AS nu
       |  FROM rn a JOIN rn b
       |    ON b.rn BETWEEN a.rn + 1 AND a.rn + ${SnmWindow - 1})
       |SELECT d1, d2, CAST(gap AS BIGINT) AS gap,
       |  CAST(ni * 100 // nu AS BIGINT) AS jacc_pct
       |FROM cand ORDER BY d1, d2""".stripMargin) { (s, dir) =>
    import s.implicits._
    val base = Tables.load(s, dir, "documents")
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select("doc_id", "text")
    val toksd = base
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct()
    val rk = ScalableRank.withRank(
      toksd.groupBy("w").agg(count(lit(1)).as("f")), "r",
      col("f"), col("w"))
      .select("w", "r")
    val dt = toksd.join(rk, "w")
      .groupBy("doc_id")
      .agg(array_sort(collect_list("r")).as("rs"), count(lit(1)).as("n"))
      .withColumn("k",
        expr("element_at(rs, 1) * 1000000L") +
          coalesce(expr("try_element_at(rs, 2)"), lit(0)))
    // Contiguous global index in (k, doc_id) order WITHOUT a global
    // window (ScalableRank = the factored q267 pattern).
    val rn = ScalableRank.withRank(dt.select(col("k"), col("doc_id")),
      "rn", col("k"), col("doc_id"))
      .select("rn", "doc_id")
    // Each doc probes its w-1 successors by index: explode + equi-join
    // keeps the candidate surface O(w·n) with no range-join fallback.
    val probes = rn.select(col("doc_id").as("d1"), col("rn").as("rn1"),
      explode(sequence(col("rn") + 1, col("rn") + lit(SnmWindow - 1)))
        .as("p"))
    val cand = probes
      .join(rn.select(col("rn").as("p"), col("doc_id").as("d2")), "p")
      .select(col("d1"), col("d2"), (col("p") - col("rn1")).as("gap"))
    cand
      .join(dt.select(col("doc_id").as("d1"), col("rs").as("rs1"),
        col("n").as("n1")), "d1")
      .join(dt.select(col("doc_id").as("d2"), col("rs").as("rs2"),
        col("n").as("n2")), "d2")
      .withColumn("ni", size(array_intersect(col("rs1"), col("rs2")))
        .cast("long"))
      .withColumn("nu", col("n1") + col("n2") - col("ni"))
      .select(col("d1"), col("d2"), col("gap").cast("long").as("gap"),
        expr("ni * 100 div nu").as("jacc_pct"))
      .orderBy("d1", "d2")
  }


  // golden-record survivorship: per user, field-level merge of
  // the event history — latest props by a total (ts, event_id) order
  // packed into a fixed-width digit key (engine-safe argmax), first/
  // last seen, exact decimal spend — the consolidation step after
  // entity resolution (q250) clusters records;
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


  /** dedup-savings forecast: exact duplicate groups (hash of
    * the raw text) summarized by GROUP SIZE — how many groups of
    * each size, how many removable copies, and how many n_chars the
    * dedup would reclaim (size−1 copies per group) — the number that
    * justifies running the dedup at all, next to q40's actual dedup;
    * one text-hash groupBy then a ≤ #groups rollup;
    */
  // ------------- q383: dedup savings forecast

  private val q383 = Q(
    "q383_dedup_savings",
    """WITH g AS (
      |  SELECT md5(text) AS h, count(*) AS sz, sum(n_chars) AS chars,
      |    max(n_chars) AS keep_chars
      |  FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL
      |  GROUP BY 1)
      |SELECT CAST(sz AS BIGINT) AS group_size,
      |  CAST(count(*) AS BIGINT) AS n_groups,
      |  CAST(sum(sz - 1) AS BIGINT) AS removable_docs,
      |  CAST(sum(chars - keep_chars) AS BIGINT) AS reclaimed_chars
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .filter(col("text").isNotNull && col("n_chars").isNotNull)
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(count(lit(1)).as("sz"), sum("n_chars").as("chars"),
        max("n_chars").as("keep_chars"))
      .groupBy(col("sz").cast("long").as("group_size"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("sz") - 1).as("removable_docs"),
        sum(col("chars") - col("keep_chars")).as("reclaimed_chars"))
      .select(col("group_size"),
        col("n_groups").cast("long").as("n_groups"),
        col("removable_docs").cast("long").as("removable_docs"),
        col("reclaimed_chars").cast("long").as("reclaimed_chars"))
      .orderBy("group_size")
  }


  def defs: Seq[Q] = Seq(q289, q292, q321, q323, q329, q383)

}
