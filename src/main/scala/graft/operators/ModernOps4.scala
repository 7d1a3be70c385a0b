package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 surfaces, part 4 — dynamic SQL plus two data-selection
  * operators every large curation stack runs ahead of training:
  *
  *  - q301 `EXECUTE IMMEDIATE` + `IDENTIFIER()` + session variables —
  *    Spark 4's injection-safe dynamic SQL (table names and predicate
  *    values arrive as BOUND VALUES, never string-spliced);
  *  - q302 DSIR-style importance weighting (Xie et al. 2023, "Data
  *    Selection for Language Models via Importance Resampling"):
  *    hashed bag-of-words features, per-bucket target/raw frequency
  *    ratios, per-document importance scores, top-k selection;
  *  - q303 hashed-linear quality-classifier inference (the fastText
  *    shape used by CCNet/LLaMA curation): bucket = hash(token),
  *    weight = fixed function of bucket, document score = one codegen
  *    hash-aggregate — classifier inference as a pure columnar scan.
  *
  * Both text operators reuse the q46 vocabulary-dictionary trick: the
  * codegen [[graft.functions.PolyHash]] fold runs once per DISTINCT
  * token (zipfian vocabulary, tiny next to the corpus) and the hash is
  * broadcast-joined back to token occurrences, so the per-occurrence
  * hot path is a codegen'd long-arithmetic projection + one hash
  * aggregate. All scores are exact integers — order-independent under
  * Spark's parallel partial aggregation and bit-identical in DuckDB.
  */
object ModernOps4 {

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

  // ------------- q301: EXECUTE IMMEDIATE + IDENTIFIER + session vars

  /** Dynamic SQL the way Spark 4 wants it written: the statement text
    * is a constant, the table name flows through `IDENTIFIER(?)` and
    * the predicate value through a `?` parameter marker, both bound
    * from SESSION VARIABLES by `EXECUTE IMMEDIATE ... USING` — so the
    * "dynamic" parts are data, not SQL text (no injection surface, and
    * the parameterized plan is byte-identical to the literal spelling;
    * ModernOps4Spec pins that). The oracle is the literal query. */
  private val q301 = Q(
    "q301_execute_immediate",
    """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM documents WHERE lang = 'en' AND source IS NOT NULL
      |GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql("DECLARE OR REPLACE VARIABLE graft_q301_tbl STRING DEFAULT 'documents'")
    s.sql("DECLARE OR REPLACE VARIABLE graft_q301_lang STRING DEFAULT 'en'")
    s.sql(
      """EXECUTE IMMEDIATE
        |  'SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |     CAST(sum(n_chars) AS BIGINT) AS total_chars
        |   FROM IDENTIFIER(?) WHERE lang = ? AND source IS NOT NULL
        |   GROUP BY source ORDER BY source'
        |  USING graft_q301_tbl, graft_q301_lang""".stripMargin)
  }

  // ------------- q302: DSIR-style importance resampling

  private val DsirBuckets = 64
  private val DsirTop = 50

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

  // ------------- q303: hashed-linear quality classifier inference

  private val ClfDim = 1024

  /** Weight of bucket `b`: a fixed Knuth-multiplicative scatter into
    * [-1001, 1001] — stands in for trained fastText weights with the
    * same inference plan (the real model would arrive as a broadcast
    * 2^20-row weight table; a 100 TB run is identical either way
    * because the weights never shuffle). */
  private def weightSql(b: String): String =
    s"($b * 2654435761) % 2003 - 1001"

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

  val defs: Seq[Q] = Seq(q301, q302, q303)
}
