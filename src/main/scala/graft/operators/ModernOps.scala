package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Round-9 surfaces: parameterized SQL + IDENTIFIER indirection,
  * IGNORE NULLS window carry-forward, a distributed chi-square
  * independence test, a grid-bucketed spatial radius join, parquet
  * merge-on-read with positional delete vectors (`_metadata.row_index`),
  * the approx_top_k sketch aggregate, and URL canonicalization for
  * crawl dedup. Every query is shuffle-shaped for 100 TB: equi-join
  * candidate generation (never all-pairs on the Spark side), map-side
  * partial aggregation, integer/decimal arithmetic where parallel
  * fold order must not drift the hash.
  */
object ModernOps {

  // ------------- q276: parameterized SQL + IDENTIFIER clause

  /** The modern injection-safe query surface: named parameters bound
    * via `spark.sql(text, args)` and table indirection through the
    * `IDENTIFIER()` clause — the plan after binding is byte-identical
    * to the literal spelling (the oracle runs exactly that literal
    * spelling), so parameterization costs nothing at any scale. */
  private val q276 = Q(
    "q276_parameterized_sql",
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS VARCHAR) AS sum_bal
      |FROM customer WHERE c_acctbal > 1000
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS STRING) AS sum_bal
        |FROM IDENTIFIER(:tbl) WHERE c_acctbal > :minbal
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
      Map("tbl" -> "customer", "minbal" -> 1000))
  }

  // ------------- q277: IGNORE NULLS window carry-forward

  /** Last-observation-carried-forward over a sparse signal: nulls are
    * planted deterministically (every 5th event), then
    * `last_value IGNORE NULLS` over a running frame fills them and
    * `first_value IGNORE NULLS` over the full partition pins the first
    * real observation — the standard gap-fill idiom that needs NO
    * self-join or subquery (one window exchange per partition key,
    * scale-safe). Values ship as integer cents (round() is half
    * away from zero in both engines on identical IEEE doubles). */
  private val q277 = Q(
    "q277_ignore_nulls_window",
    """SELECT event_id, user_id,
      |  CAST(round(last_value(v IGNORE NULLS) OVER w * 100) AS BIGINT)
      |    AS carry_cents,
      |  CAST(round(first_value(v IGNORE NULLS) OVER w2 * 100) AS BIGINT)
      |    AS first_cents
      |FROM (SELECT event_id, user_id, ts,
      |        CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
      |      FROM events WHERE user_id < 100)
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |  w2 AS (PARTITION BY user_id ORDER BY ts, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY user_id, ts, event_id""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    // Spark spells the null treatment as a postfix clause on the call;
    // semantics (and the window exchanges) are identical.
    s.sql(
      """SELECT event_id, user_id,
        |  CAST(round(last_value(v) IGNORE NULLS OVER w * 100) AS BIGINT)
        |    AS carry_cents,
        |  CAST(round(first_value(v) IGNORE NULLS OVER w2 * 100) AS BIGINT)
        |    AS first_cents
        |FROM (SELECT event_id, user_id, ts,
        |        CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
        |      FROM events WHERE user_id < 100)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  w2 AS (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, ts, event_id""".stripMargin)
  }

  // ------------- q278: chi-square independence test

  /** Pearson chi-square for event_type × day-of-week independence —
    * the data-drift gate a production corpus runs per ingest batch.
    * Shape: ONE shuffle to the contingency table (map-side partial
    * counts), then window sums over the tiny cell table (|types|×7
    * rows) on a single partition. All drift-sensitive arithmetic is
    * exact-integer until a single per-cell double term, which both
    * engines compute from identical bigints with identical IEEE ops;
    * terms are quantized to integer micros BEFORE the final sum so the
    * total is an exact bigint fold in any order. */
  private val q278 = Q(
    "q278_chi_square_independence",
    """WITH obs AS (
      |  SELECT event_type, CAST(dayofweek(ts) + 1 AS INT) AS dow,
      |    CAST(count(*) AS BIGINT) AS o
      |  FROM events GROUP BY 1, 2),
      |tot AS (
      |  SELECT event_type, dow, o,
      |    SUM(o) OVER (PARTITION BY event_type) AS r,
      |    SUM(o) OVER (PARTITION BY dow) AS c,
      |    SUM(o) OVER () AS n
      |  FROM obs)
      |SELECT event_type, dow, o,
      |  CAST(round(CAST(o*n - r*c AS DOUBLE) * CAST(o*n - r*c AS DOUBLE)
      |    / (CAST(r AS DOUBLE)*c*n) * 1000000) AS BIGINT) AS term_micro,
      |  CAST(SUM(CAST(round(CAST(o*n - r*c AS DOUBLE) * CAST(o*n - r*c AS DOUBLE)
      |    / (CAST(r AS DOUBLE)*c*n) * 1000000) AS BIGINT)) OVER () AS BIGINT) AS chi2_micro
      |FROM tot ORDER BY event_type, dow""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    // Spark dayofweek() is already 1..7 (Sunday=1); DuckDB's is 0..6,
    // hence the +1 on the oracle side only.
    s.sql(
      """WITH obs AS (
        |  SELECT event_type, CAST(dayofweek(ts) AS INT) AS dow,
        |    count(*) AS o
        |  FROM events GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, dow, o,
        |    SUM(o) OVER (PARTITION BY event_type) AS r,
        |    SUM(o) OVER (PARTITION BY dow) AS c,
        |    SUM(o) OVER () AS n
        |  FROM obs)
        |SELECT event_type, dow, o,
        |  CAST(round(CAST(o*n - r*c AS DOUBLE) * CAST(o*n - r*c AS DOUBLE)
        |    / (CAST(r AS DOUBLE)*c*n) * 1000000) AS BIGINT) AS term_micro,
        |  SUM(CAST(round(CAST(o*n - r*c AS DOUBLE) * CAST(o*n - r*c AS DOUBLE)
        |    / (CAST(r AS DOUBLE)*c*n) * 1000000) AS BIGINT)) OVER () AS chi2_micro
        |FROM tot ORDER BY event_type, dow""".stripMargin)
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
    """WITH m AS (
      |  SELECT CAST(floor(sqrt(max(c_custkey)) * 2582) AS BIGINT) AS side
      |  FROM customer),
      |pts AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS id,
      |    (c_custkey * 48271) % side AS x,
      |    (c_custkey * c_custkey) % side AS y
      |  FROM customer CROSS JOIN m)
      |SELECT a.id AS id_a, b.id AS id_b,
      |  CAST((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS BIGINT) AS dist2
      |FROM pts a JOIN pts b ON a.id < b.id
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

  // ------------- q280: merge-on-read positional delete vectors

  /** Lakehouse merge-on-read: base parquet files stay immutable and a
    * DELETE writes only a positional delete vector — (file_path,
    * row_index) pairs, here taken from the `_metadata` hidden columns
    * every Spark parquet scan exposes. A reader anti-joins the scan
    * against the vector: no rewrite of 100 TB of base data to delete
    * 0.1%, and the anti-join keys are the scan's own physical
    * coordinates (hash-partitionable, no skew — row_index is unique
    * per file). The oracle recomputes from the logical predicate the
    * delete encoded. */
  private val q280 = Q(
    "q280_mor_positional_deletes",
    """SELECT CAST(count(*) AS BIGINT) AS n_live,
      |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS sum_price
      |FROM orders WHERE o_orderkey % 7 <> 3""".stripMargin) { (s, dir) =>
    val out = java.nio.file.Files
      .createTempDirectory("graft_q280_base").toString
    val delDir = java.nio.file.Files
      .createTempDirectory("graft_q280_dv").toString
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_totalprice"))
      .repartition(4)
      .write.mode("overwrite").parquet(out)
    def scan = s.read.parquet(out).select(
      col("o_orderkey"), col("o_totalprice"),
      col("_metadata.file_path").as("fp"),
      col("_metadata.row_index").as("pos"))
    // the DELETE: write ONLY the positional vector, base files untouched
    scan.filter(col("o_orderkey") % 7 === 3).select("fp", "pos")
      .write.mode("overwrite").parquet(delDir)
    val dv = s.read.parquet(delDir)
    scan.join(dv, Seq("fp", "pos"), "left_anti")
      .agg(count(lit(1)).as("n_live"),
        sum("o_orderkey").cast("long").as("sum_key"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("string")
          .as("sum_price"))
  }

  // ------------- q281: approx_top_k sketch aggregate

  /** Spark 4's approx_top_k frequent-items sketch (space-bounded,
    * mergeable — the distributed heavy-hitters surface next to the
    * custom Misra-Gries in q191). k covers every distinct value here,
    * so the sketch is EXACT and the count-ordered output has no
    * boundary-tie ambiguity against the exact oracle. */
  private val q281 = Q(
    "q281_approx_top_k",
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n
      |FROM events GROUP BY event_type
      |ORDER BY n DESC, event_type""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT t.item AS event_type, CAST(t.count AS BIGINT) AS n
        |FROM (SELECT explode(tk) AS t
        |      FROM (SELECT approx_top_k(event_type, 5) AS tk FROM events))
        |ORDER BY n DESC, event_type""".stripMargin)
  }

  // ------------- q282: URL canonicalization for crawl dedup

  /** Web-corpus URL canonicalization: parse host/path/query
    * (parse_url), strip tracking parameters (utm_*, ref), and regroup
    * by canonical URL — the first pass of every crawl dedup. URLs are
    * synthesized deterministically from document fields so the oracle
    * can rebuild the canonical form directly; the Spark side does the
    * real parse → filter-params → reassemble pipeline (all codegen
    * string/array expressions, one shuffle to the canonical group). */
  private val q282 = Q(
    "q282_url_canonicalize",
    """SELECT source || '.example.org/' || lang || '/'
      |    || CAST(doc_id % 40 AS VARCHAR)
      |    || '?page=' || CAST(doc_id % 3 AS VARCHAR) AS canonical,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(min(doc_id) AS BIGINT) AS min_doc
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .withColumn("url", concat(
        lit("https://"), col("source"), lit(".example.org/"), col("lang"),
        lit("/"), (col("doc_id") % 40).cast("string"),
        lit("?utm_source=feed&ref="), (col("doc_id") % 7).cast("string"),
        lit("&page="), (col("doc_id") % 3).cast("string")))
      .withColumn("host", expr("parse_url(url, 'HOST')"))
      .withColumn("path", expr("parse_url(url, 'PATH')"))
      .withColumn("cleanq", expr(
        """array_join(filter(split(parse_url(url, 'QUERY'), '&'),
          |  p -> NOT (p LIKE 'utm\\_%' OR p LIKE 'ref=%')), '&')""".stripMargin))
      .withColumn("canonical", concat(col("host"), col("path"),
        when(col("cleanq") =!= "", concat(lit("?"), col("cleanq")))
          .otherwise(lit(""))))
      .groupBy("canonical")
      .agg(count(lit(1)).as("n_docs"),
        min("doc_id").cast("long").as("min_doc"))
      .orderBy("canonical")
  }

  // ------------- q283: BPE-style tokenizer encode, pure codegen

  /** Tokenizer-encode as a chain of codegen string expressions — no
    * UDF, no broadcast, no shuffle until the final sort: lowercase →
    * collapse non-alpha runs to a `|` word separator → space-split
    * every character → apply a fixed merge table in rank order as
    * plain `replace` calls (left-to-right non-overlapping in BOTH
    * engines, so results are bit-identical even at shared-boundary
    * corner cases where true BPE would differ) → count surviving
    * symbols. The per-doc cost is linear in text length and fully
    * inside whole-stage codegen — the shape that matters when the
    * encode pass runs over 100 TB of documents. */
  private val BpeMerges = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
    ("an", "d"), ("e", "r"), ("o", "n"), ("r", "e"))

  private def bpeChain(col: String): String =
    BpeMerges.foldLeft(col) { case (acc, (a, b)) =>
      s"replace($acc, ' $a $b ', ' $a$b ')"
    }

  private val q283 = Q(
    "q283_bpe_apply_encode",
    s"""WITH sym AS (
       |  SELECT doc_id,
       |    ' ' || regexp_replace(regexp_replace(lower(text), '[^a-z]+', '|', 'g'),
       |      '(.)', '\\1 ', 'g') AS s,
       |    length(regexp_replace(lower(text), '[^a-z]+', '', 'g')) AS n_chars
       |  FROM documents),
       |merged AS (SELECT doc_id, n_chars, ${bpeChain("s")} AS m FROM sym)
       |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       |  CAST(len(list_filter(regexp_split_to_array(trim(m), ' +'),
       |    x -> x <> '|' AND x <> '')) AS BIGINT) AS n_tokens
       |FROM merged ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      s"""WITH sym AS (
         |  SELECT doc_id,
         |    concat(' ', regexp_replace(regexp_replace(lower(text),
         |      '[^a-z]+', '|'), '(.)', '$$1 ')) AS s,
         |    length(regexp_replace(lower(text), '[^a-z]+', '')) AS n_chars
         |  FROM documents),
         |merged AS (SELECT doc_id, n_chars, ${bpeChain("s")} AS m FROM sym)
         |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
         |  CAST(size(filter(split(trim(m), ' +'),
         |    x -> x != '|' AND x != '')) AS BIGINT) AS n_tokens
         |FROM merged ORDER BY doc_id""".stripMargin)
  }

  // ------------- q284: HLL sketch incremental distinct

  /** The incremental-distinct production pattern: per-day HLL sketches
    * (hll_sketch_agg — mergeable, constant-size state, map-side
    * partial) that roll up to a global distinct WITHOUT re-touching
    * raw data (hll_union_agg). The exact per-day totals are the
    * oracle-checked payload; the sketch estimates are pinned by
    * PROPERTY (within 5% of exact, a deterministic bound since HLL is
    * order-independent and deterministic for a fixed input set) — the
    * q121 property-oracle pattern for approximate operators. */
  private val q284 = Q(
    "q284_hll_incremental_distinct",
    """WITH daily AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
      |    count(DISTINCT user_id) AS exact_d
      |  FROM events GROUP BY 1)
      |SELECT CAST(count(*) AS BIGINT) AS n_days,
      |  CAST(sum(exact_d) AS BIGINT) AS sum_daily_distinct,
      |  TRUE AS daily_est_ok, TRUE AS union_est_ok
      |FROM daily""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """WITH daily AS (
        |  SELECT CAST(date_trunc('DAY', ts) AS DATE) AS day,
        |    hll_sketch_agg(user_id) AS sk,
        |    count(DISTINCT user_id) AS exact_d
        |  FROM events GROUP BY 1),
        |total AS (SELECT count(DISTINCT user_id) AS g FROM events)
        |SELECT CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(exact_d) AS BIGINT) AS sum_daily_distinct,
        |  bool_and(abs(hll_sketch_estimate(sk) - exact_d) <= 0.05 * exact_d)
        |    AS daily_est_ok,
        |  abs(hll_sketch_estimate(hll_union_agg(sk)) - first(total.g))
        |    <= 0.05 * first(total.g) AS union_est_ok
        |FROM daily CROSS JOIN total""".stripMargin)
  }

  // ------------- q285: ANSI WITHIN GROUP percentiles

  /** ANSI ordered-set aggregates: percentile_cont / percentile_disc
    * WITHIN GROUP (ORDER BY ...) — the inverse-distribution surface
    * next to the approx sketches (q135) and exact window percentiles
    * (q97). Quantities are integral doubles, so the f=0.5/0.9
    * interpolations are exact in IEEE arithmetic and the cents
    * quantization cannot sit on a rounding boundary. */
  private val q285 = Q(
    "q285_within_group_percentiles",
    """SELECT l_returnflag,
      |  CAST(round(quantile_cont(l_quantity, 0.5) * 100) AS BIGINT) AS p50_c,
      |  CAST(round(quantile_cont(l_quantity, 0.9) * 100) AS BIGINT) AS p90_c,
      |  CAST(round(quantile_disc(l_quantity, 0.25) * 100) AS BIGINT) AS p25d_c,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
    (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT l_returnflag,
        |  CAST(round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity)
        |    * 100) AS BIGINT) AS p50_c,
        |  CAST(round(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity)
        |    * 100) AS BIGINT) AS p90_c,
        |  CAST(round(percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)
        |    * 100) AS BIGINT) AS p25d_c,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  // ------------- q286: LISTAGG

  /** ANSI LISTAGG WITHIN GROUP — ordered string concatenation per
    * group. The ORDER BY inside the aggregate is what makes a parallel
    * fold deterministic; bounded here by a key filter the way any sane
    * 100 TB use would bound it (LISTAGG over unbounded groups is an
    * anti-pattern — the q187 collect_set caveat applies). */
  private val q286 = Q(
    "q286_listagg",
    """SELECT n.n_name,
      |  string_agg(c.c_name, ',' ORDER BY c.c_name) AS names,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE c.c_custkey <= 200
      |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT n.n_name,
        |  listagg(c.c_name, ',') WITHIN GROUP (ORDER BY c.c_name) AS names,
        |  count(*) AS n
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE c.c_custkey <= 200
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin)
  }

  // ------------- q287: XML functions round trip

  /** Spark 4's native XML surface (to_xml / from_xml): serialize a
    * struct per row, parse it back with an explicit schema, and emit
    * the recovered fields — the oracle pins the round trip as an
    * identity on the base table. Both directions are scalar codegen
    * expressions: no shuffle at all until the output sort, so the
    * pass is embarrassingly parallel at any scale. */
  private val q287 = Q(
    "q287_xml_roundtrip",
    """SELECT CAST(s_suppkey AS BIGINT) AS k, s_name,
      |  CAST(s_nationkey AS BIGINT) AS nk
      |FROM supplier ORDER BY k""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "supplier")
      .select(col("s_suppkey").cast("long").as("k"), col("s_name"),
        col("s_nationkey").cast("long").as("nk"))
      .withColumn("xml", expr("to_xml(struct(k, s_name, nk))"))
      .withColumn("p", expr("from_xml(xml, 'k BIGINT, s_name STRING, nk BIGINT')"))
      .select(col("p.k").as("k"), col("p.s_name").as("s_name"),
        col("p.nk").as("nk"))
      .orderBy("k")
  }

  // ------------- q288: dynamic-gap session windows (batch)

  /** `session_window` with an EXPRESSION-valued gap — purchases hold a
    * session open for 60 minutes, everything else 30 — the
    * per-event-class timeout real clickstream sessionization needs.
    * Merge semantics: each event spans [ts, ts+gap), overlapping spans
    * coalesce, so a session's end is max(ts+gap) over its members;
    * the merge is boundary-INCLUSIVE — an event landing exactly on the
    * session end EXTENDS it (pinned by the adversarial corpus, whose
    * exactly-gap-spaced purchase chains Spark folds into one session).
    * The oracle replays exactly that with a running max over the prior
    * events' spans. One shuffle on the session key — the same cost as
    * a static-gap session. */
  private val q288 = Q(
    "q288_dynamic_gap_sessions",
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS t, event_id,
      |    CASE WHEN event_type = 'purchase'
      |         THEN 3600000000 ELSE 1800000000 END AS gap
      |  FROM events WHERE user_id < 200),
      |m AS (
      |  SELECT user_id, t, event_id, gap,
      |    MAX(t + gap) OVER (PARTITION BY user_id ORDER BY t, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      |  FROM e),
      |s AS (
      |  SELECT user_id, t, gap,
      |    SUM(CASE WHEN prev_end IS NULL OR t > prev_end THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY t, event_id) AS sid
      |  FROM m)
      |SELECT user_id, CAST(min(t) AS BIGINT) AS start_us,
      |  CAST(max(t + gap) AS BIGINT) AS end_us,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM s GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin) {
    (s, dir) =>
    val gap = when(col("event_type") === "purchase", lit("60 minutes"))
      .otherwise(lit("30 minutes"))
    Tables.load(s, dir, "events")
      .filter(col("user_id") < 200)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"), col("n"))
      .orderBy("user_id", "start_us")
  }

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

  // ------------- q290: Hilbert-curve layout quality

  /** The Hilbert companion to q217's Z-order layout: bucket rows by
    * the top bits of their Hilbert index ([[graft.functions.HilbertCode]],
    * codegen) and report each bucket's 2-D bounding box. Hilbert's
    * walk is grid-adjacent at every step, so contiguous index ranges
    * cover tighter boxes than Morton's diagonal-jumping ranges —
    * tighter per-file min/max stats after a range-partitioned write,
    * better 2-D pruning (the spec pins Hilbert's total bbox area under
    * Morton's on identical data). The oracle replays the identical 16
    * bit-plane rotations as a chained-CTE SQL text emitted by the same
    * object, so both engines compute the identical integer. */
  private val q290 = Q(
    "q290_hilbert_layout", {
      val (ctes, last) = graft.functions.HilbertCode.oracleCtes(
        "src", Seq.empty, "//")
      s"""WITH src AS (
         |  SELECT l_partkey % 65536 AS x, l_suppkey % 65536 AS y
         |  FROM lineitem),
         |$ctes
         |SELECT d // 1048576 AS bucket, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(min(x0) AS BIGINT) AS min_x, CAST(max(x0) AS BIGINT) AS max_x,
         |  CAST(min(y0) AS BIGINT) AS min_y, CAST(max(y0) AS BIGINT) AS max_y,
         |  CAST((max(x0) - min(x0) + 1) * (max(y0) - min(y0) + 1) AS BIGINT)
         |    AS bbox_area
         |FROM $last GROUP BY bucket ORDER BY bucket""".stripMargin
    }) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    Tables.load(s, dir, "lineitem")
      .select(expr("l_partkey % 65536").as("x"),
        expr("l_suppkey % 65536").as("y"))
      .withColumn("bucket", expr("graft_hilbert(x, y) div 1048576"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"),
        ((max("x") - min("x") + 1) * (max("y") - min("y") + 1))
          .as("bbox_area"))
      .orderBy("bucket")
  }

  val defs: Seq[Q] =
    Seq(q276, q277, q278, q279, q280, q281, q282, q283, q284, q285, q286,
      q287, q288, q289, q290)
}
