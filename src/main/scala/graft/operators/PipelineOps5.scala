package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 pipeline operators, part 5: retrieval ranking, corpus-quality
  * filtering, weighted systematic sampling, session transition mining,
  * integer-exact trend fitting, containment dedup, co-occurrence lift,
  * and Z-order layout.
  *
  * Scale design (shared themes):
  *  - Every score that would classically use log/float (BM25 idf, PMI)
  *    is reformulated as an order-equivalent integer ratio in fixed
  *    micro/basis-point units: both engines then compute bit-identical
  *    values at any corpus magnitude (the q01/q144 lesson).
  *  - Corpus-side work is one linear scan + one shuffle wherever
  *    possible; small derived tables (query terms, per-term df, top
  *    vocabulary) broadcast back onto the big side.
  *  - Anything pair-shaped is bounded by an explicit cap that is part
  *    of the operator contract and replicated in the oracle (rare-
  *    shingle df cap, top-K vocabulary), never by sampling.
  */
object PipelineOps5 {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // --------------------- q208: BM25-style retrieval (integer idf)

  /** Canned retrieval queries (query_id, term). */
  private val Queries = Seq(
    (1L, "hash"), (1L, "join"),
    (2L, "scan"), (2L, "filter"), (2L, "column"),
    (3L, "stream"), (3L, "window"))

  private val q208 = Q(
    "q208_bm25_retrieval",
    s"""WITH qt(query_id, term) AS (VALUES
       |    ${Queries.map { case (q, t) => s"($q, '$t')" }.mkString(", ")}),
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
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY score DESC, doc_id) AS rnk FROM sc)
       |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
       |  CAST(score AS BIGINT) AS score, CAST(rnk AS BIGINT) AS rnk
       |FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin) {
    (s, dir) =>
    // BM25 with the log-idf replaced by the order-equivalent rational
    // (2(N-df)+1)/(2df+1) in integer micro-units, and tf saturation
    // tf/(tf+k1), k1=2 — every term contribution is an exact integer.
    // The corpus scan keeps ONLY tokens matching the broadcast query
    // vocabulary, so tf/df shuffles carry a vanishing fraction of the
    // corpus; df for the query terms equals full-corpus df by
    // definition (df counts docs containing the term).
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val qt = Queries.toDF("query_id", "term")
    val tok = docs(s, dir)
      .select(col("doc_id"), explode(expr("graft_words(text)")).as("w"))
    val hits = tok
      .join(broadcast(qt.select("term").distinct()), col("w") === col("term"))
      .select("doc_id", "w")
    val tf = hits.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val nDocs = docs(s, dir).agg(count(lit(1)).as("n_docs"))
    val contrib = expr(
      """((((2 * (n_docs - df) + 1) * 1000000) div (2 * df + 1)) * tf)
        |  div (tf + 2)""".stripMargin)
    val scored = qt
      .join(tf.withColumnRenamed("w", "term"), "term")
      .join(broadcast(dfc.withColumnRenamed("w", "term")), "term")
      .crossJoin(broadcast(nDocs))
      .groupBy("query_id", "doc_id")
      .agg(sum(contrib).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 10)
      .select(col("query_id"), col("doc_id"), col("score"), col("rnk"))
      .orderBy("query_id", "rnk")
  }

  // --------------------- q210: character-diversity quality filter

  private val q210 = Q(
    "q210_char_diversity",
    """WITH ch AS (
      |  SELECT doc_id, substr(text, CAST(i AS INT), 1) AS c
      |  FROM documents, unnest(generate_series(1, len(text))) AS g(i)
      |  WHERE len(text) > 0),
      |hist AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2),
      |top AS (SELECT doc_id, c AS top_char, n AS top_n,
      |        row_number() OVER (PARTITION BY doc_id
      |          ORDER BY n DESC, c) AS rn FROM hist),
      |agg AS (SELECT doc_id, count(*) AS distinct_chars, sum(n) AS n_chars
      |        FROM hist GROUP BY 1)
      |SELECT a.doc_id AS doc_id, CAST(a.n_chars AS BIGINT) AS n_chars,
      |  CAST(a.distinct_chars AS BIGINT) AS distinct_chars,
      |  t.top_char AS top_char, CAST(t.top_n AS BIGINT) AS top_char_n,
      |  CAST(t.top_n * 10000 // a.n_chars AS BIGINT) AS dominance_bp,
      |  (t.top_n * 10000 // a.n_chars) >= 2000 AS low_diversity
      |FROM agg a JOIN top t ON t.doc_id = a.doc_id AND t.rn = 1
      |ORDER BY a.doc_id""".stripMargin) { (s, dir) =>
    // Low-entropy gibberish detection without entropy's log: distinct
    // character count plus dominance of the most frequent character in
    // basis points (ties to the smallest code point — identical to the
    // oracle's ORDER BY n DESC, c over single-codepoint strings).
    // The whole per-doc histogram folds inside ONE codegen expression
    // ([[graft.functions.CharStats]]) in the scan projection — the
    // original explode-per-character + (doc, char) shuffle was this
    // round's only 10x scale-smoke flag (14x on 10x data); this shape
    // is zero-shuffle corpus-linear.
    graft.functions.GraftFunctions.register(s)
    docs(s, dir).filter(length(col("text")) > 0)
      .select(col("doc_id"), expr("graft_char_stats(text)").as("cs"))
      .select(col("doc_id"), col("cs.n_chars").as("n_chars"),
        col("cs.distinct_chars").as("distinct_chars"),
        col("cs.top_char").as("top_char"),
        col("cs.top_n").as("top_char_n"),
        expr("cs.top_n * 10000 div cs.n_chars").as("dominance_bp"),
        (expr("cs.top_n * 10000 div cs.n_chars") >= 2000).as("low_diversity"))
      .orderBy("doc_id")
  }

  // --------------------- q211: token-budget systematic sampling

  /** Sampling stride in tokens: one doc picked per S tokens of stream. */
  private val SampleStride = 500

  private val q211 = Q(
    "q211_token_budget_sample",
    s"""WITH tok AS (
       |  SELECT doc_id, source,
       |    len(list_filter(string_split(text, ' '), w -> w <> '')) AS tok
       |  FROM documents),
       |c AS (
       |  SELECT source, doc_id, tok,
       |    sum(tok) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM tok WHERE tok > 0)
       |SELECT source, doc_id, CAST(tok AS BIGINT) AS n_tokens,
       |  CAST(cum AS BIGINT) AS cum_tokens,
       |  CAST(cum // $SampleStride AS BIGINT) AS sample_idx
       |FROM c WHERE cum // $SampleStride > (cum - tok) // $SampleStride
       |ORDER BY source, doc_id""".stripMargin) { (s, dir) =>
    // Deterministic weighted sampling: a doc is selected iff its token
    // span covers a multiple of the stride, so selection probability is
    // proportional to length with ZERO randomness — reproducible across
    // engines, runs, and partitionings (the property a training-data
    // subsample audit needs). One partition-local window per source.
    graft.functions.GraftFunctions.register(s)
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs(s, dir)
      .select(col("source"), col("doc_id"),
        size(expr("graft_words(text)")).cast("long").as("tok"))
      .filter(col("tok") > 0)
      .withColumn("cum", sum("tok").over(w))
      .filter(expr(s"cum div $SampleStride > (cum - tok) div $SampleStride"))
      .select(col("source"), col("doc_id"), col("tok").as("n_tokens"),
        col("cum").as("cum_tokens"),
        expr(s"cum div $SampleStride").as("sample_idx"))
      .orderBy("source", "doc_id")
  }

  // --------------------- q213: session transition counts

  /** Session gap bound (30 min) in microseconds. */
  private val GapUs = 1800000000L

  private val q213 = Q(
    "q213_session_transitions",
    s"""WITH b AS (
       |  SELECT user_id, event_id, event_type,
       |    epoch_us(date_trunc('microseconds', ts)) AS us
       |  FROM events),
       |o AS (
       |  SELECT event_type, us,
       |    lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS pus,
       |    lag(event_type) OVER (PARTITION BY user_id
       |      ORDER BY us, event_id) AS ptype
       |  FROM b)
       |SELECT ptype AS from_type, event_type AS to_type,
       |  CAST(count(*) AS BIGINT) AS n_transitions
       |FROM o WHERE pus IS NOT NULL AND us - pus <= $GapUs
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    // The Markov-transition view of user journeys: consecutive events
    // of one user within a session (gap <= 30 min) contribute one
    // (from, to) pair. One shuffle on user_id; the lag window is
    // partition-local; the transition matrix is |types|^2 — tiny.
    val w = Window.partitionBy("user_id")
      .orderBy(col("us"), col("event_id"))
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .select(col("event_type"), col("us"),
        lag("us", 1).over(w).as("pus"),
        lag("event_type", 1).over(w).as("ptype"))
      .filter(col("pus").isNotNull && col("us") - col("pus") <= GapUs)
      .groupBy(col("ptype").as("from_type"),
        col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy("from_type", "to_type")
  }

  // --------------------- q214: integer-exact linear trend per type

  private val q214 = Q(
    "q214_linear_trend",
    """WITH b AS (
      |  SELECT event_type,
      |    epoch_us(date_trunc('microseconds', ts)) // 86400000000 AS day,
      |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS yc
      |  FROM events),
      |c AS (
      |  SELECT event_type, yc,
      |    day - min(day) OVER (PARTITION BY event_type) AS x
      |  FROM b),
      |a AS (
      |  SELECT event_type, count(*) AS n, count(DISTINCT x) AS n_days,
      |    sum(x) AS sx, sum(yc) AS sy, sum(x * x) AS sxx,
      |    sum(x * yc) AS sxy
      |  FROM c GROUP BY 1),
      |d AS (
      |  SELECT event_type, n, n_days, sy,
      |    CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
      |    CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den
      |  FROM a)
      |SELECT event_type, CAST(n AS BIGINT) AS n_events,
      |  CAST(n_days AS BIGINT) AS n_days,
      |  CAST(sy AS BIGINT) AS sum_value_cents,
      |  CASE WHEN den = 0 THEN NULL
      |       WHEN num >= 0 THEN CAST((num * 10000) // den AS BIGINT)
      |       ELSE -CAST(((-num) * 10000) // den AS BIGINT)
      |  END AS slope_bp_per_day
      |FROM d ORDER BY event_type""".stripMargin) { (s, dir) =>
    // Least-squares slope of value-vs-day per event type with NO
    // floating point: values go to exact cents, days are centered per
    // group (keeps x small so BIGINT sums never overflow), and the
    // closed-form slope numerator/denominator are computed in 38-digit
    // decimals (DuckDB: HUGEINT). The slope ships in basis points of a
    // cent per day via sign-split truncating division — both engines
    // truncate identically on non-negative operands. den = 0 (a type
    // seen on a single day) yields NULL, not a crash.
    val wMin = Window.partitionBy("event_type")
    val c = Tables.load(s, dir, "events")
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        (col("value").cast("decimal(12,2)") * 100).cast("long").as("yc"))
      .withColumn("x", col("day") - min("day").over(wMin))
    val a = c.groupBy("event_type").agg(
      count(lit(1)).as("n"), countDistinct("x").as("n_days"),
      sum("x").as("sx"), sum("yc").as("sy"),
      sum(expr("x * x")).as("sxx"), sum(expr("x * yc")).as("sxy"))
    val d = a.select(col("event_type"), col("n"), col("n_days"), col("sy"),
      (col("n").cast("decimal(38,0)") * col("sxy") -
        col("sx").cast("decimal(38,0)") * col("sy")).as("num"),
      (col("n").cast("decimal(38,0)") * col("sxx") -
        col("sx").cast("decimal(38,0)") * col("sx")).as("den"))
    d.select(col("event_type"), col("n").as("n_events"),
        col("n_days"), col("sy").as("sum_value_cents"),
        when(col("den") === 0, lit(null).cast("long"))
          .when(col("num") >= 0, expr("(num * 10000) div den"))
          .otherwise(-expr("((-num) * 10000) div den"))
          .as("slope_bp_per_day"))
      .orderBy("event_type")
  }

  // --------------------- q215: containment near-dup (rare shingles)

  /** Shingle width (tokens), df cap, and report threshold. */
  private val ContW = 8
  private val ContDfCap = 20
  private val ContMinBp = 2500

  private val q215 = Q(
    "q215_containment_dup",
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
       |  FROM documents),
       |s AS (
       |  SELECT DISTINCT doc_id, array_to_string(ws[i+1 : i+$ContW], ' ') AS sh
       |  FROM t, unnest(generate_series(0, len(ws) - $ContW)) AS g(i)
       |  WHERE len(ws) >= $ContW),
       |rare AS (SELECT sh FROM s GROUP BY sh HAVING count(*) <= $ContDfCap),
       |sr AS (SELECT s.doc_id AS doc_id, s.sh AS sh FROM s JOIN rare USING (sh)),
       |na AS (SELECT doc_id, count(*) AS n FROM sr GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS shared
       |  FROM sr a JOIN sr b ON a.sh = b.sh AND a.doc_id <> b.doc_id
       |  GROUP BY 1, 2)
       |SELECT p.da AS doc_a, p.db AS doc_b,
       |  CAST(p.shared AS BIGINT) AS shared_shingles,
       |  CAST(na.n AS BIGINT) AS n_shingles_a,
       |  CAST(p.shared * 10000 // na.n AS BIGINT) AS containment_bp
       |FROM pairs p JOIN na ON na.doc_id = p.da
       |WHERE p.shared * 10000 // na.n >= $ContMinBp
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
    // Asymmetric containment |S(a) intersect S(b)| / |S(a)| — catches a
    // short doc quoted inside a long one, which symmetric Jaccard
    // (q44/q45) scores near zero. The universe is RARE shingles only
    // (df <= $ContDfCap): the inverted-index self-join then fans out at
    // most df per posting, bounding pair generation by O(postings *
    // cap) — the contract that keeps containment linear at corpus
    // scale; boilerplate shingles (high df) carry no dedup signal and
    // are exactly what the cap drops.
    graft.functions.GraftFunctions.register(s)
    val t = docs(s, dir)
      .select(col("doc_id"), expr("graft_words(text)").as("ws"))
      .withColumn("n", size(col("ws"))).filter(col("n") >= ContW)
    val sh = t.select(col("doc_id"), explode(expr(
        s"array_distinct(transform(sequence(0, n - $ContW), i -> concat_ws(' ', slice(ws, i + 1, $ContW))))"))
        .as("sh"))
    val rare = sh.groupBy("sh").agg(count(lit(1)).as("dfs"))
      .filter(col("dfs") <= ContDfCap).select("sh")
    val sr = sh.join(rare, "sh")
    val na = sr.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = sr.as("a").join(sr.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("shared"))
    pairs.join(na.withColumnRenamed("doc_id", "da"), "da")
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        col("shared").as("shared_shingles"),
        col("n").as("n_shingles_a"),
        expr("shared * 10000 div n").as("containment_bp"))
      .filter(col("containment_bp") >= ContMinBp)
      .orderBy("doc_a", "doc_b")
  }

  // --------------------- q216: term co-occurrence lift

  /** Vocabulary size for the co-occurrence matrix. */
  private val TopTerms = 40

  private val q216 = Q(
    "q216_term_cooccur_lift",
    s"""WITH tok AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
       |  FROM documents),
       |pres AS (SELECT DISTINCT doc_id, w
       |         FROM (SELECT doc_id, unnest(ws) AS w FROM tok)),
       |dfc AS (SELECT w, count(*) AS df FROM pres GROUP BY 1),
       |top AS (SELECT w, df FROM (
       |  SELECT w, df, row_number() OVER (ORDER BY df DESC, w) AS rn
       |  FROM dfc) WHERE rn <= $TopTerms),
       |pt AS (SELECT p.doc_id AS doc_id, p.w AS w, t.df AS df
       |       FROM pres p JOIN top t USING (w)),
       |nd AS (SELECT count(*) AS n FROM documents),
       |pairs AS (
       |  SELECT a.w AS t1, b.w AS t2, a.df AS df1, b.df AS df2,
       |    count(*) AS c_xy
       |  FROM pt a JOIN pt b ON a.doc_id = b.doc_id AND a.w < b.w
       |  GROUP BY 1, 2, 3, 4)
       |SELECT t1, t2, CAST(c_xy AS BIGINT) AS n_docs_both,
       |  CAST(df1 AS BIGINT) AS df1, CAST(df2 AS BIGINT) AS df2,
       |  CAST((CAST(c_xy AS HUGEINT) * nd.n * 10000)
       |    // (CAST(df1 AS HUGEINT) * df2) AS BIGINT) AS lift_bp
       |FROM pairs CROSS JOIN nd
       |ORDER BY lift_bp DESC, t1, t2 LIMIT 100""".stripMargin) { (s, dir) =>
    // PMI-style association with the log dropped: lift = P(x,y) /
    // (P(x)P(y)) in integer basis points. The vocabulary is capped at
    // the $TopTerms highest-df terms (deterministic ties), so the
    // per-doc pair fan-out is <= C($TopTerms, 2) — a constant — and
    // the corpus side stays one scan + one (doc, term) shuffle; the
    // vocabulary broadcasts. 38-digit decimals (HUGEINT in DuckDB)
    // keep the lift product exact at any N.
    graft.functions.GraftFunctions.register(s)
    val pres = docs(s, dir)
      .select(col("doc_id"), explode(expr("graft_words(text)")).as("w"))
      .distinct()
    val dfc = pres.groupBy("w").agg(count(lit(1)).as("df"))
    val wTop = Window.orderBy(col("df").desc, col("w"))
    val top = dfc.withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= TopTerms).select("w", "df")
    val pt = pres.join(broadcast(top), "w")
    val nDocs = docs(s, dir).agg(count(lit(1)).as("n"))
    val pairs = pt.as("a").join(pt.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.w") < col("b.w"))
      .groupBy(col("a.w").as("t1"), col("b.w").as("t2"),
        col("a.df").as("df1"), col("b.df").as("df2"))
      .agg(count(lit(1)).as("c_xy"))
    pairs.crossJoin(broadcast(nDocs))
      .select(col("t1"), col("t2"), col("c_xy").as("n_docs_both"),
        col("df1"), col("df2"),
        expr("""(cast(c_xy AS DECIMAL(38,0)) * n * 10000)
               |  div (cast(df1 AS DECIMAL(38,0)) * df2)""".stripMargin)
          .as("lift_bp"))
      .orderBy(col("lift_bp").desc, col("t1"), col("t2"))
      .limit(100)
  }

  // --------------------- q217: Z-order layout quality

  private val q217 = Q(
    "q217_zorder_layout", {
      val morton = graft.functions.MortonCode.oracleSql(
        "(l_partkey % 65536)", "(l_suppkey % 65536)")
      s"""WITH z AS (
         |  SELECT l_partkey % 65536 AS x, l_suppkey % 65536 AS y,
         |    $morton // 1048576 AS bucket
         |  FROM lineitem)
         |SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x,
         |  CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y,
         |  CAST((max(x) - min(x) + 1) * (max(y) - min(y) + 1) AS BIGINT)
         |    AS bbox_area
         |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin
    }) { (s, dir) =>
    // The write-side layout primitive for multi-column pruning: bucket
    // rows by the top bits of their Morton code and show each bucket's
    // bounding box. Tight per-bucket (min, max) ranges on BOTH key
    // columns are exactly what makes parquet row-group stats prune
    // either-column predicates after a `repartitionByRange(zkey)`
    // write. graft_morton is a codegen'd branch-free Expression, so
    // the key add is free inside the scan's WholeStageCodegen span.
    graft.functions.GraftFunctions.register(s)
    Tables.load(s, dir, "lineitem")
      .select(expr("l_partkey % 65536").as("x"),
        expr("l_suppkey % 65536").as("y"))
      .withColumn("bucket", expr("graft_morton(x, y) div 1048576"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"),
        ((max("x") - min("x") + 1) * (max("y") - min("y") + 1))
          .as("bbox_area"))
      .orderBy("bucket")
  }

  // --------------------- q220: chunk-level dedup survivorship

  /** Non-overlapping chunk width (tokens). */
  private val ChunkW = 20

  private val q220 = Q(
    "q220_chunk_dedup",
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, (i - 1) // $ChunkW AS idx,
       |    array_to_string(ws[CAST(i AS INT) : CAST(i + $ChunkW - 1 AS INT)], ' ') AS chunk
       |  FROM t, unnest(generate_series(1, len(ws), $ChunkW)) AS g(i)
       |  WHERE len(ws) > 0),
       |r AS (
       |  SELECT doc_id, idx,
       |    row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx) AS rn
       |  FROM c)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       |  CAST((count(*) - sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)) * 10000
       |    // count(*) AS BIGINT) AS survival_bp
       |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    // Paragraph-style dedup at sub-document granularity: the corpus is
    // cut into non-overlapping $ChunkW-token chunks; the FIRST global
    // occurrence of each chunk text (by (doc_id, idx) — deterministic
    // first-writer-wins) survives, later ones are dups. One bounded
    // explode (n/$ChunkW chunks per doc) + one shuffle on the chunk
    // key + one on doc_id — corpus-linear; production would key the
    // window on a 128-bit chunk hash, which changes nothing
    // structurally (the string key keeps the oracle exact).
    graft.functions.GraftFunctions.register(s)
    val t = docs(s, dir)
      .select(col("doc_id"), expr("graft_words(text)").as("ws"))
      .withColumn("n", size(col("ws"))).filter(col("n") > 0)
    val chunks = t.select(col("doc_id"),
        posexplode(expr(s"transform(sequence(1, n, $ChunkW), " +
          s"i -> concat_ws(' ', slice(ws, i, $ChunkW)))")))
      .select(col("doc_id"), col("pos").cast("long").as("idx"),
        col("col").as("chunk"))
    val w = Window.partitionBy("chunk").orderBy("doc_id", "idx")
    chunks.withColumn("rn", row_number().over(w))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
        expr("(n_chunks - n_dup_chunks) * 10000 div n_chunks")
          .as("survival_bp"))
      .orderBy("doc_id")
  }

  // --------------------- q222: Z-order write + 2-D box scan

  /** Lineitem rewritten Z-order-clustered: (x, y) key moduli, the
    * Morton key, quantity payload; range-partitioned and sorted by the
    * Morton key so each output file owns a contiguous Z range (tight
    * per-file min/max on BOTH x and y — the pruning contract).
    * Memoized per dir, invalidated when the source regenerates. */
  def zorderedLineitem(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val out = s"/tmp/graft_zorder_${math.abs(dir.hashCode)}"
    val success = new java.io.File(s"$out/_SUCCESS")
    val src = new java.io.File(s"$dir/lineitem.parquet")
    if (!success.exists() || success.lastModified() < src.lastModified()) {
      Tables.load(s, dir, "lineitem")
        .select(expr("l_partkey % 65536").as("x"),
          expr("l_suppkey % 65536").as("y"),
          col("l_quantity").cast("decimal(12,2)").as("qty"))
        .withColumn("zkey", expr("graft_morton(x, y)"))
        .repartitionByRange(8, col("zkey"))
        .sortWithinPartitions("zkey")
        .write.mode("overwrite").parquet(out)
    }
    s.read.parquet(out)
  }

  private val q222 = Q(
    "q222_zorder_pruning",
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS sum_qty,
      |  CAST(min(l_partkey % 65536) AS BIGINT) AS min_x,
      |  CAST(max(l_suppkey % 65536) AS BIGINT) AS max_y
      |FROM lineitem
      |WHERE l_partkey % 65536 BETWEEN 64 AND 127
      |  AND l_suppkey % 65536 BETWEEN 1 AND 8""".stripMargin) { (s, dir) =>
    // The read side of q217's layout story: a 2-D box predicate over a
    // Z-order-clustered rewrite of lineitem. Because every file owns a
    // contiguous Morton range, its parquet min/max stats are tight on
    // BOTH x and y, and the pushed range filters skip most row groups
    // at scan time — the single-column-sort layout can only ever serve
    // one of the two predicates. Value equality vs the raw-table oracle
    // proves the rewrite lossless; PlanAuditSpec pins that the
    // clustered scan actually reads fewer rows than an unclustered one.
    zorderedLineitem(s, dir)
      .filter(col("x").between(64, 127) && col("y").between(1, 8))
      .agg(count(lit(1)).as("n_rows"),
        sum("qty").cast("string").as("sum_qty"),
        min("x").as("min_x"), max("y").as("max_y"))
  }

  val defs: Seq[Q] =
    Seq(q208, q210, q211, q213, q214, q215, q216, q217, q220, q222)
}
