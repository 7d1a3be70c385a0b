package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-9 surfaces, part 12 — mergeable quantile sketches, windowed
  * dedup candidate generation, and sequence pattern matching:
  *
  *  - q322 log-bucket quantile sketch (DDSketch-style, base-2 with 16
  *    sub-buckets per octave): bucket ids are pure integer arithmetic
  *    (bit length + top mantissa bits), the sketch is a tiny mergeable
  *    (group, bucket)→count table, and quantiles come from cumulative
  *    bucket counts — relative-error-bounded percentiles with O(#buckets)
  *    state where exact percentiles need a full sort;
  *  - q323 sorted-neighborhood dedup (SNM): docs sorted by a numeric
  *    blocking key (packed rarest-token ranks), candidates are the w−1
  *    following neighbors in the sort order — O(w·n) candidate pairs
  *    instead of n², generated with the q267 range-partitioned global
  *    index (no single-partition window), then exact-Jaccard scored;
  *  - q324 event-sequence pattern matching (MATCH_RECOGNIZE-lite):
  *    per (user, day) the time-ordered event-initial string is matched
  *    against a funnel regex (`v[cv]*p`: view, browsing, purchase) —
  *    the repeated class excludes the terminator, so greedy and
  *    leftmost-longest semantics coincide and both engines count the
  *    same non-overlapping matches.
  */
object ModernOps12 {

  // ------------- q322: log-bucket quantile sketch

  /** Bucket id of a positive cents value: bit length bl (= floor(log2)+1,
    * via the binary string — identical in both engines) times 32, plus
    * the top-5-bit mantissa. Values below 32 are their own bucket
    * (shift 0), so small buckets are exact. */
  private val BucketSql =
    """length(bin(cents)) * 32
      | + (cents >> greatest(length(bin(cents)) - 5, 0))""".stripMargin
      .replace("\n", "")

  /** Spark spells integer shift/div the same way except `>>` → shiftright
    * and `//` → div; quantile ranks use ceil((q·n)/100) in exact integer
    * form on both sides. */
  private val q322 = Q(
    "q322_logbucket_quantile_sketch",
    s"""WITH v AS (
       |  SELECT l_returnflag AS flag,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
       |      AS cents
       |  FROM lineitem
       |  WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL),
       |vp AS (SELECT flag, cents FROM v WHERE cents > 0),
       |sk AS (
       |  SELECT flag, $BucketSql AS bucket, count(*) AS cnt
       |  FROM vp GROUP BY 1, 2),
       |tot AS (SELECT flag, sum(cnt) AS n FROM sk GROUP BY 1),
       |cum AS (
       |  SELECT flag, bucket,
       |    sum(cnt) OVER (PARTITION BY flag ORDER BY bucket) AS cum
       |  FROM sk),
       |qs AS (SELECT unnest([50, 90, 99]) AS q),
       |kth AS (
       |  SELECT t.flag, qs.q, t.n, (qs.q * t.n + 99) // 100 AS k
       |  FROM tot t CROSS JOIN qs),
       |est AS (
       |  SELECT k.flag, k.q, k.n, k.k, min(c.bucket) AS bucket
       |  FROM kth k JOIN cum c ON c.flag = k.flag AND c.cum >= k.k
       |  GROUP BY 1, 2, 3, 4),
       |bounds AS (
       |  SELECT flag, q, n, k, bucket,
       |    (bucket % 32) << greatest(bucket // 32 - 5, 0) AS b_lo,
       |    ((bucket % 32 + 1) << greatest(bucket // 32 - 5, 0)) - 1 AS b_hi
       |  FROM est),
       |ex AS (
       |  SELECT flag, cents,
       |    row_number() OVER (PARTITION BY flag ORDER BY cents) AS rn
       |  FROM vp)
       |SELECT b.flag AS l_returnflag, CAST(b.q AS BIGINT) AS q,
       |  CAST(b.n AS BIGINT) AS n, CAST(b.b_lo AS BIGINT) AS b_lo,
       |  CAST(b.b_hi AS BIGINT) AS b_hi,
       |  CAST(e.cents AS BIGINT) AS exact_cents,
       |  e.cents BETWEEN b.b_lo AND b.b_hi AS contained
       |FROM bounds b JOIN ex e ON e.flag = b.flag AND e.rn = b.k
       |ORDER BY l_returnflag, q""".stripMargin) { (s, dir) =>
    import s.implicits._
    val vp = Tables.load(s, dir, "lineitem")
      .filter(col("l_returnflag").isNotNull &&
        col("l_extendedprice").isNotNull)
      .select(col("l_returnflag").as("flag"),
        (col("l_extendedprice").cast(DecimalType(12, 2)) * 100)
          .cast("long").as("cents"))
      .filter(col("cents") > 0)
    // The sketch: one partial-aggregated shuffle to a (flag, bucket)
    // table whose size is bounded by #flags × #buckets (~64/octave),
    // independent of row count — this is the whole scale story.
    val sk = vp
      .withColumn("bucket", expr(
        "length(bin(cents)) * 32" +
          " + shiftright(cents, greatest(length(bin(cents)) - 5, 0))"))
      .groupBy("flag", "bucket").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val tot = sk.groupBy("flag").agg(sum("cnt").as("n"))
    val cum = sk.select(col("flag"), col("bucket"),
      sum("cnt").over(org.apache.spark.sql.expressions.Window
        .partitionBy("flag").orderBy("bucket")).as("cum"))
    val kth = tot.crossJoin(Seq(50, 90, 99).toDF("q"))
      .withColumn("k", expr("(q * n + 99) div 100"))
    val est = kth.as("k")
      .join(cum.as("c"),
        col("c.flag") === col("k.flag") && col("c.cum") >= col("k.k"))
      .groupBy(col("k.flag").as("flag"), col("k.q").as("q"),
        col("k.n").as("n"), col("k.k").as("k"))
      .agg(min("c.bucket").as("bucket"))
    val bounds = est
      .withColumn("b_lo",
        expr("shiftleft(bucket % 32, greatest(bucket div 32 - 5, 0))"))
      .withColumn("b_hi", expr(
        "shiftleft(bucket % 32 + 1, greatest(bucket div 32 - 5, 0)) - 1"))
    // Exact verification branch (full per-flag sort — the cost the
    // sketch exists to avoid; kept here to PIN the error bound).
    val ex = vp.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("flag").orderBy("cents")))
    bounds.as("b")
      .join(ex.as("e"),
        col("e.flag") === col("b.flag") && col("e.rn") === col("b.k"))
      .select(col("b.flag").as("l_returnflag"),
        col("b.q").cast("long").as("q"), col("b.n").cast("long").as("n"),
        col("b.b_lo").cast("long").as("b_lo"),
        col("b.b_hi").cast("long").as("b_hi"),
        col("e.cents").cast("long").as("exact_cents"),
        col("e.cents").between(col("b.b_lo"), col("b.b_hi"))
          .as("contained"))
      .orderBy("l_returnflag", "q")
  }

  // ------------- q323: sorted-neighborhood dedup

  private val SnmWindow = 6 // each doc pairs with the 5 following docs

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

  // ------------- q324: event-sequence pattern matching

  /** Funnel pattern over event initials (c=click e=error p=purchase
    * s=signup v=view): a view, any browsing, then a purchase. The
    * repeated class [cv] excludes the terminator p, so every match is
    * forced — Java-greedy (Spark) and RE2 (DuckDB) agree, and the
    * non-overlapping count equals the split-separator count. */
  private val FunnelPat = "v[cv]*p"

  private val q324 = Q(
    "q324_sequence_pattern_match",
    s"""WITH e AS (
       |  SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id,
       |    substr(event_type, 1, 1) AS c
       |  FROM events
       |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
       |    AND event_type IS NOT NULL),
       |sq AS (
       |  SELECT user_id, day,
       |    string_agg(c, '' ORDER BY ts, event_id) AS seq
       |  FROM e GROUP BY 1, 2)
       |SELECT user_id, day, CAST(length(seq) AS BIGINT) AS seq_len,
       |  CAST(len(regexp_split_to_array(seq, '$FunnelPat')) - 1 AS BIGINT)
       |    AS n_funnels,
       |  regexp_extract(seq, '$FunnelPat') AS first_funnel
       |FROM sq ORDER BY user_id, day""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        struct(col("ts"), col("event_id"),
          substring(col("event_type"), 1, 1).as("c")).as("e"))
      .groupBy("user_id", "day")
      .agg(array_sort(collect_list("e")).as("arr"))
      .withColumn("seq",
        concat_ws("", expr("transform(arr, x -> x.c)")))
      .select(col("user_id"), col("day"),
        length(col("seq")).cast("long").as("seq_len"),
        expr(s"regexp_count(seq, '$FunnelPat')").cast("long")
          .as("n_funnels"),
        expr(s"regexp_extract(seq, '$FunnelPat', 0)").as("first_funnel"))
      .orderBy("user_id", "day")
  }

  val defs: Seq[Q] = Seq(q322, q323, q324)
}
