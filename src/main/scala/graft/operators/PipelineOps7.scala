package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 pipeline operators: exact similarity join via prefix
  * filtering, deterministic weighted sampling, BPE-style pair counting,
  * WITH TIES top-n, null-safe joins, and integer-exact exponential
  * smoothing.
  *
  * Scale notes are per-query; the shared theme is that every operator
  * here is the shuffle-minimal form of its family: candidate generation
  * before pairwise work (q244), k-bounded map-side aggregation before
  * any shuffle (q245), word-level pre-aggregation before pair explosion
  * (q246), threshold-broadcast instead of a global window (q247).
  */
object PipelineOps7 {

  // ------------------- q244: AllPairs/PPJoin-style exact Jaccard join

  /** Jaccard threshold (part of the operator definition). */
  private val JacT = 0.6

  /** Exact set-similarity join at Jaccard >= 0.6 via prefix filtering
    * (Bayardo et al., WWW'07 "Scaling Up All Pairs Similarity Search"):
    * order each doc's shingles by ascending document frequency (rarest
    * first, (df, g) total order); a doc of n tokens only needs its
    * first n - ceil(t*n) + 1 tokens indexed — any pair with J >= t must
    * share a prefix token under the common order. Candidates come from
    * an equi-join on prefix tokens (shuffle keyed on RARE tokens, so
    * fan-out per key is small by construction), then exact verification
    * intersects the full sorted arrays with the allocation-free
    * graft_isect_count merge. Same result as the quadratic q44 shape,
    * but the n^2 surface is never materialized — this is the exact-join
    * scale twin of the approximate MinHash path (q45).
    *
    * Oracle: the exact quadratic join (q44's formulation at t=0.6) —
    * lossless filtering means bit-identical output.
    */
  private val q244 = Q(
    "q244_allpairs_jaccard",
    s"""WITH ${TextOps.Sh3OracleCte},
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
       |pairs AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
       |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT d1, d2,
       |  CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) AS jaccard
       |FROM pairs
       |JOIN sizes s1 ON s1.doc_id = d1
       |JOIN sizes s2 ON s2.doc_id = d2
       |WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= $JacT
       |ORDER BY d1, d2""".stripMargin) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    val sets = TextOps.docShingleSets(s, dir)
    val tok = sets.select(col("doc_id"), explode(col("gs")).as("g"))
    val dfreq = tok.groupBy("g").agg(count(lit(1)).as("df"))
    // Rarest-first canonical order = sort by (df, g). r16: the order is
    // materialized as a global RANK (injective shingle -> long), so
    // every downstream structure — prefix keys, candidate join keys,
    // verification arrays — carries 8-byte longs instead of ~30-byte
    // shingle strings, and the exact verification runs the codegen'd
    // two-pointer merge (graft_isect_count) instead of a per-row hash
    // set. |A ∩ B| is invariant under the injective mapping, so the
    // output is bit-identical. Prefix length p = n - ceil(t*n) + 1,
    // ceil(3n/5) in exact integer math, unchanged.
    val rk = ScalableRank.withRank(dfreq, "r", col("df"), col("g"))
      .select("g", "r")
    // Materialized once: feeds the prefix explode AND both verification
    // joins (the plan otherwise re-derives shingle->rank->sort per
    // consumer). On a cluster: persist().
    val ordered = tok.join(rk, "g")
      .groupBy("doc_id")
      .agg(sort_array(collect_list("r")).as("rs"))
      .withColumn("n", size(col("rs")))
      .withColumn("p", col("n") - floor((lit(3) * col("n") + 4) / 5) + 1)
      .localCheckpoint()
    val prefixTok = ordered
      .select(col("doc_id"), col("n"),
        explode(expr("slice(rs, 1, int(p))")).as("g"))
    // r16 (guide §3): the AllPairs LENGTH filter rides the candidate
    // join — J >= t forces t*max(n1,n2) <= min(n1,n2) (overlap is at
    // most min and at least t*union >= t*max), so 5*min >= 3*max drops
    // no true pair (result-identical by theorem) while pruning the
    // enumerated candidates before the distinct and the verify joins.
    val cand = prefixTok.as("a")
      .join(prefixTok.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id") &&
          lit(5) * least(col("a.n"), col("b.n")) >=
            lit(3) * greatest(col("a.n"), col("b.n")))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    cand
      .join(ordered.select(col("doc_id").as("d1"), col("rs").as("rs1"),
        col("n").as("n1")), "d1")
      .join(ordered.select(col("doc_id").as("d2"), col("rs").as("rs2"),
        col("n").as("n2")), "d2")
      .withColumn("inter", expr("graft_isect_count(rs1, rs2)"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jaccard") >= JacT)
      .select("d1", "d2", "jaccard")
      .orderBy("d1", "d2")
  }

  // ------------------- q245: deterministic weighted sample (A-Res)

  /** Sample size per language group. */
  private val SampleK = 5

  /** Deterministic pseudo-uniform in (0,1): Knuth multiplicative hash
    * of doc_id, reduced mod 2^20 — BIGINT-exact in both engines. */
  private val UExpr =
    "((doc_id * 2654435761) % 1048576 + 1) / 1048577.0"

  /** Weighted reservoir sampling without replacement (Efraimidis &
    * Spirakis A-Res): key_i = u_i^(1/w_i), take the k largest keys per
    * group — equivalently rank by ln(u)/w descending. The randomness is
    * a deterministic integer hash so the oracle reproduces it exactly;
    * the key is rounded to 12 decimals so a 1-ulp libm difference
    * between JVM log and DuckDB ln cannot flip a rank (ties then break
    * by doc_id via TopKAgg's (v DESC, id ASC) total order).
    *
    * Scale: the naive form is a per-group window sort over every row;
    * this uses the k-bounded TopKAgg, so map-side partial aggregation
    * prunes each (group, partition) to <= k rows before the shuffle —
    * the group count (languages) can be tiny without skewing a sort.
    */
  private val q245 = Q(
    "q245_weighted_sample",
    s"""SELECT lang, doc_id, n_chars FROM (
       |  SELECT lang, doc_id, n_chars,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY round(ln($UExpr) / greatest(n_chars, 1), 12) DESC,
       |               doc_id) AS rn
       |  FROM documents)
       |WHERE rn <= $SampleK ORDER BY lang, doc_id""".stripMargin) { (s, dir) =>
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk",
      exprs => graft.functions.TopKAgg(exprs(0), exprs(1), SampleK)
        .toAggregateExpression(),
      "scala_udf")
    Tables.registerAll(s, dir)
    s.sql(
      s"""WITH keyed AS (
         |  SELECT lang, doc_id,
         |    round(ln($UExpr) / greatest(n_chars, 1), 12) AS k
         |  FROM documents),
         |top AS (SELECT lang, graft_topk(k, doc_id) AS picks
         |        FROM keyed GROUP BY lang),
         |ids AS (SELECT lang, elem.id AS doc_id
         |        FROM top LATERAL VIEW explode(picks) x AS elem)
         |SELECT ids.lang, ids.doc_id, d.n_chars
         |FROM ids JOIN documents d USING (doc_id)
         |ORDER BY lang, doc_id""".stripMargin)
  }

  // ------------------- q246: BPE-style adjacent pair counting

  /** Top adjacent character-pair counts over corpus words — the inner
    * loop of byte-pair-encoding vocabulary induction. The classic BPE
    * scale trick is applied: aggregate to DISTINCT words first (Zipf
    * collapses the corpus by orders of magnitude), then explode each
    * word's adjacent pairs weighted by its frequency — the pair shuffle
    * carries unique words, not corpus tokens. */
  private val q246 = Q(
    "q246_bpe_pair_counts",
    """WITH words AS (
      |  SELECT w, count(*) AS cnt FROM (
      |    SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
      |    FROM documents)
      |  WHERE length(w) > 1 GROUP BY w),
      |pairs AS (
      |  SELECT unnest(list_transform(range(1, length(w)),
      |                               i -> substr(w, i, 2))) AS pair, cnt
      |  FROM words)
      |SELECT pair, CAST(sum(cnt) AS BIGINT) AS n
      |FROM pairs GROUP BY pair ORDER BY n DESC, pair LIMIT 30""".stripMargin) {
    (s, dir) =>
    val words = Tables.load(s, dir, "documents")
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .filter(length(col("w")) > 1)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    words
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"), col("cnt"))
      .groupBy("pair").agg(sum("cnt").as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(30)
  }

  // ------------------- q247: top-n WITH TIES via broadcast threshold

  /** Rows to fetch before extending to ties. */
  private val TiesN = 200

  /** FETCH FIRST n ROWS WITH TIES. The naive form ranks every row in
    * one global window partition; instead the n-th key is found with a
    * TakeOrderedAndProject (top-n, no global sort) and broadcast back
    * as a filter — at 100 TB the scan-side predicate does the work and
    * the "window" never exists. WITH TIES == rank() <= n because rank
    * jumps past tie runs. */
  private val q247 = Q(
    "q247_fetch_with_ties",
    // DuckDB has no WITH TIES; the rank()<=n formulation is equivalent
    // (rank jumps past tie runs) and independently derived. NULL sort
    // keys are excluded explicitly: Spark orders NULLS FIRST ascending,
    // DuckDB NULLS LAST — WITH TIES over a null-bearing key is
    // engine-defined, so the operator pins the non-null contract.
    s"""SELECT o_orderdate, o_orderkey, o_totalprice FROM (
       |  SELECT o_orderdate, o_orderkey, o_totalprice,
       |    rank() OVER (ORDER BY o_orderdate) AS r FROM orders
       |  WHERE o_orderdate IS NOT NULL)
       |WHERE r <= $TiesN
       |ORDER BY o_orderdate, o_orderkey""".stripMargin) { (s, dir) =>
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate").isNotNull)
      .select("o_orderdate", "o_orderkey", "o_totalprice")
    val nth = o.orderBy("o_orderdate").limit(TiesN)
      .agg(max("o_orderdate").as("cutoff"))
    o.join(broadcast(nth), o("o_orderdate") <= nth("cutoff"))
      .select("o_orderdate", "o_orderkey", "o_totalprice")
      .orderBy("o_orderdate", "o_orderkey")
  }

  // ------------------- q248: null-safe join (IS NOT DISTINCT FROM)

  /** Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM) with NULLs in
    * the key domain on both sides. Aggregate-then-join keeps the
    * null-safe comparison on grouped (tiny) relations; at scale the
    * caveat is that every NULL key lands in one partition — the rewrite
    * to a sentinel via coalesce is the skew escape hatch, but the
    * operator itself must match NULL to NULL exactly once, which this
    * pins. */
  private val q248 = Q(
    "q248_null_safe_join",
    """WITH c AS (SELECT nullif(c_nationkey % 7, 3) AS k, count(*) AS n_cust
      |           FROM customer GROUP BY 1),
      |s AS (SELECT nullif(s_nationkey % 7, 3) AS k, count(*) AS n_supp
      |      FROM supplier GROUP BY 1)
      |SELECT c.k AS k, CAST(c.n_cust AS BIGINT) AS n_cust,
      |  CAST(s.n_supp AS BIGINT) AS n_supp
      |FROM c JOIN s ON c.k IS NOT DISTINCT FROM s.k
      |ORDER BY k NULLS FIRST""".stripMargin) { (s, dir) =>
    val c = Tables.load(s, dir, "customer")
      .groupBy(nullif(col("c_nationkey") % 7, lit(3)).as("k"))
      .agg(count(lit(1)).as("n_cust"))
    val su = Tables.load(s, dir, "supplier")
      .groupBy(nullif(col("s_nationkey") % 7, lit(3)).as("k2"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(su, col("k") <=> col("k2"))
      .select(col("k"), col("n_cust"), col("n_supp"))
      .orderBy(asc_nulls_first("k"))
  }

  // ------------------- q249: integer-exact exponential smoothing

  /** Truncated exponential-decay smoothing per user (half-life kernel
    * 16/8/4/2/1 over the trailing five events, integer cents — exact in
    * both engines, no float accumulation order to diverge). One window
    * shuffle keyed on user_id; state per row is four lags. */
  private val q249 = Q(
    "q249_exp_decay_smooth",
    """SELECT event_id, user_id,
      |  16 * c0 + 8 * coalesce(c1, 0) + 4 * coalesce(c2, 0)
      |    + 2 * coalesce(c3, 0) + coalesce(c4, 0) AS smooth31
      |FROM (
      |  SELECT event_id, user_id,
      |    CAST(round(value * 100) AS BIGINT) AS c0,
      |    lag(CAST(round(value * 100) AS BIGINT), 1)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS c1,
      |    lag(CAST(round(value * 100) AS BIGINT), 2)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS c2,
      |    lag(CAST(round(value * 100) AS BIGINT), 3)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS c3,
      |    lag(CAST(round(value * 100) AS BIGINT), 4)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS c4
      |  FROM events)
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val cents = round(col("value") * 100).cast("long")
    Tables.load(s, dir, "events")
      .withColumn("c0", cents)
      .withColumn("c1", lag(cents, 1).over(w))
      .withColumn("c2", lag(cents, 2).over(w))
      .withColumn("c3", lag(cents, 3).over(w))
      .withColumn("c4", lag(cents, 4).over(w))
      .select(col("event_id"), col("user_id"),
        (lit(16) * col("c0") + lit(8) * coalesce(col("c1"), lit(0L))
          + lit(4) * coalesce(col("c2"), lit(0L))
          + lit(2) * coalesce(col("c3"), lit(0L))
          + coalesce(col("c4"), lit(0L))).as("smooth31"))
      .orderBy("event_id")
  }

  val defs: Seq[Q] = Seq(q244, q245, q246, q247, q248, q249)
}
