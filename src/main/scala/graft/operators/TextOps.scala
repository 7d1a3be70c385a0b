package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Large-scale training-data text pipeline: dedup (exact, n-gram Jaccard,
  * MinHash+LSH, SimHash), text analysis (tokens, quality, language-ID,
  * fingerprints). All over the `documents` table.
  *
  * Scale design (100 TB):
  *  - per-document features are single-projection, codegen'd expressions —
  *    no shuffle, no UDFs;
  *  - exact pairwise similarity (q44/q46/q48 oracles) is the *correctness
  *    baseline*; the scale path is LSH banding (q45 MinHash, q49 random
  *    hyperplanes): candidates come from equi-joins on (band, signature)
  *    — a shuffle on a high-cardinality key, never an n² cross join —
  *    then exact verification only on candidates.
  */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** q53's rolling polynomial fingerprint over the first 20 non-empty
    * tokens, as a Spark SQL fragment and its DuckDB twin — shared with
    * the round-5 shard-assignment op (PipelineOps q133). Word atoms are
    * (len*31 + first-codepoint); mod at each step keeps intermediates
    * < 2^52 so the fold is bit-identical across engines. */
  private[operators] val FingerprintSpark =
    """aggregate(
      |  transform(slice(filter(split(text, ' '), w -> w <> ''), 1, 20),
      |            w -> CAST(length(w) * 31 + ascii(w) AS BIGINT)),
      |  7L, (acc, x) -> (acc * 1000003 + x) % 2147483647)""".stripMargin

  private[operators] val FingerprintOracle =
    """list_reduce(list_prepend(CAST(7 AS BIGINT), list_transform(
      |    list_filter(string_split(text, ' '), w -> w <> '')[:20],
      |    w -> CAST(length(w) * 31 + ord(w) AS BIGINT))),
      |    (acc, x) -> (acc * 1000003 + x) % 2147483647)""".stripMargin

  // -------------------------------------------------------- exact dedup

  private val q40 = Q(
    "q40_dedup_exact",
    """SELECT array_to_string((string_split(text, ' '))[:5], ' ') AS dup_key,
      |  MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY 1 HAVING COUNT(*) > 1
      |ORDER BY dup_key""".stripMargin) { (s, dir) =>
    // Exact dedup on a normalization key (first 5 tokens). Deterministic
    // keep-rule: min doc_id (groupBy-min, not dropDuplicates, which keeps
    // an arbitrary row and breaks distributed determinism).
    docs(s, dir)
      .withColumn("dup_key", concat_ws(" ", slice(split(col("text"), " "), 1, 5)))
      .groupBy("dup_key")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .orderBy("dup_key")
  }

  // ------------------------------------------------------ text analysis

  private val q41 = Q(
    "q41_text_stats",
    """SELECT doc_id,
      |  CAST(length(text) AS INT) AS n_chars,
      |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_types,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |    / len(string_split(text, ' ')) AS ttr,
      |  CAST(len(list_filter(string_split(text, ' '),
      |      w -> w IN ('the', 'a', 'of', 'and', 'to'))) AS INT) AS n_stop,
      |  CAST(len(list_filter(string_split(text, ' '),
      |      w -> w IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
      |    / len(string_split(text, ' ')) AS stop_ratio
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val ws = split(col("text"), " ")
    docs(s, dir).select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      size(ws).as("n_tokens"),
      size(array_distinct(ws)).as("n_types"),
      (size(array_distinct(ws)).cast("double") / size(ws)).as("ttr"),
      size(expr("filter(split(text, ' '), w -> w IN ('the','a','of','and','to'))"))
        .as("n_stop"),
      (size(expr("filter(split(text, ' '), w -> w IN ('the','a','of','and','to'))"))
        .cast("double") / size(ws)).as("stop_ratio"))
      .orderBy("doc_id")
  }

  private val q42 = Q(
    "q42_quality_score",
    """SELECT doc_id,
      |  0.4 * LEAST(CAST(len(string_split(text, ' ')) AS DOUBLE) / 50, 1.0)
      |  + 0.4 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |           / len(string_split(text, ' ')))
      |  + 0.2 * (CASE WHEN length(text) BETWEEN 50 AND 2000 THEN 1.0 ELSE 0.0 END)
      |    AS quality
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    // Heuristic quality score: length saturation + lexical diversity +
    // in-range length bonus. Pure codegen'd arithmetic, no shuffle.
    val ws = split(col("text"), " ")
    docs(s, dir).select(
      col("doc_id"),
      (lit(0.4) * least(size(ws).cast("double") / 50, lit(1.0))
        + lit(0.4) * (size(array_distinct(ws)).cast("double") / size(ws))
        + lit(0.2) * when(length(col("text")).between(50, 2000), 1.0).otherwise(0.0))
        .as("quality"))
      .orderBy("doc_id")
  }

  private val q43 = Q(
    "q43_token_count",
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS n_re_tokens
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    // Whitespace tokens + a BPE-ish regex tokenizer (letter runs / digit
    // runs / single punctuation) — same pattern class in Java and RE2.
    docs(s, dir).select(
      col("doc_id"),
      size(split(col("text"), " ")).as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
        .as("n_re_tokens"))
      .orderBy("doc_id")
  }

  private val q52 = Q(
    "q52_lang_id",
    """SELECT doc_id, lang,
      |  CASE WHEN len(list_filter(string_split(text, ' '),
      |              w -> w IN ('the', 'a', 'of', 'and', 'is'))) >= 2 THEN 'en'
      |       WHEN len(list_filter(string_split(text, ' '),
      |              w -> w IN ('el', 'la', 'de', 'los'))) >= 2 THEN 'es'
      |       ELSE 'und' END AS lang_pred
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    // Marker-token language ID (n-gram-heuristic family): deterministic
    // CASE cascade so ties resolve identically everywhere.
    docs(s, dir).select(
      col("doc_id"), col("lang"),
      when(size(expr("filter(split(text,' '), w -> w IN ('the','a','of','and','is'))")) >= 2, "en")
        .when(size(expr("filter(split(text,' '), w -> w IN ('el','la','de','los'))")) >= 2, "es")
        .otherwise("und").as("lang_pred"))
      .orderBy("doc_id")
  }

  private val q53 = Q(
    "q53_fingerprint",
    s"SELECT doc_id, $FingerprintOracle AS fp FROM documents ORDER BY doc_id") {
    (s, dir) =>
    // Rolling polynomial fingerprint over the first 20 NON-EMPTY tokens
    // (fragments shared with q133 shard assignment — see FingerprintSpark
    // scaladoc). Empty tokens (consecutive spaces) are filtered on BOTH
    // sides: Spark ascii('') = 0 but DuckDB ord('') = -1, the same
    // engine-divergence class PolyHash closes for q46.
    docs(s, dir).select(
      col("doc_id"),
      expr(FingerprintSpark).as("fp"))
      .orderBy("doc_id")
  }

  // ----------------------------------------------- n-gram Jaccard dedup

  /** doc_id → distinct word-3-gram shingle array (the shared building
    * block of q44/q45), via the one-pass [[graft.functions.WordShingles]]
    * expression. */
  private[operators] def docShingleSets(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    docs(s, dir)
      .select(col("doc_id"), expr("graft_shingles3(text)").as("gs"))
      .filter(size(col("gs")) > 0)
  }

  /** doc_id → exploded distinct shingles. */
  private def shingles(s: SparkSession, dir: String): DataFrame =
    docShingleSets(s, dir).select(col("doc_id"), explode(col("gs")).as("g"))

  /** The DuckDB twin of [[docShingleSets]] as a CTE body (shared with
    * the q146 incremental ingest gate). */
  private[graft] val Sh3OracleCte =
    """sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    list_transform(range(1, greatest(len(ws) - 1, 1)),
      |                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS g
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents))""".stripMargin

  private val jaccardOracle =
    s"""WITH $Sh3OracleCte,
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
      |WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= %THRESH%
      |ORDER BY d1, d2""".stripMargin

  private val q44 = Q(
    "q44_ngram_jaccard",
    jaccardOracle.replace("%THRESH%", "0.8")) { (s, dir) =>
    // Exact n-gram Jaccard near-dup pairs (the correctness baseline for
    // the LSH variants). The shingle equi-join is shuffle-bound, not n².
    val sh = shingles(s, dir)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.withColumnRenamed("doc_id", "d1")
    val b = sh.withColumnRenamed("doc_id", "d2").withColumnRenamed("g", "g2")
    val inter = a.join(b, a("g") === b("g2") && a("d1") < b("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
    val s1 = sizes.select(col("doc_id").as("d1"), col("n").as("n1"))
    val s2 = sizes.select(col("doc_id").as("d2"), col("n").as("n2"))
    inter.join(broadcast(s1), "d1").join(broadcast(s2), "d2")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jaccard") >= 0.8)
      .select("d1", "d2", "jaccard")
      .orderBy("d1", "d2")
  }

  // --------------------------------------------------- MinHash + LSH

  private[graft] val MinhashP = 2038074743L // prime < 2^31
  private[graft] val NumHashes = 64
  private val BandRows = 4 // 16 bands x 4 rows
  private[graft] val (hashA, hashB) = {
    val rnd = new scala.util.Random(42)
    (Array.fill(NumHashes)(1L + rnd.nextInt((MinhashP - 1).toInt)),
      Array.fill(NumHashes)(rnd.nextInt(MinhashP.toInt).toLong))
  }

  /** doc_id → (band, bsig) bucket keys: one fused codegen MinHash pass
    * (64 perms) per document, 16 bands x 4 rows each hashed to a single
    * bucket key. Shared by q45 and the q146 incremental ingest gate. */
  /** [[bandedSigs]] but carrying each row's shingle set along as SORTED
    * 64-bit HASHES (and taking the docs as a DataFrame, so a STREAMING
    * source works) — the streaming LSH dedup (q400) verifies candidates
    * exactly inside its stateful processor, which needs both sides'
    * sets. Hashes, not strings: the set rides the shuffle once per band
    * (16×) and then lives in keyed state, so an ~8-byte element instead
    * of a full shingle string is the difference between a lean RocksDB
    * index and multi-GB state at the 100x corpus. Jaccard over distinct
    * xxhash64 values equals Jaccard over the shingles themselves unless
    * two distinct shingles of a candidate pair collide in 64 bits
    * (~|union|²/2⁻⁶⁴ per pair) — the same accepted-risk family as q45's
    * band-miss bound, and far below it. */
  private[graft] def bandedSigsWithSets(
      s: SparkSession, docsets: DataFrame): DataFrame = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash",
      exprs => graft.functions.MinHashSig(exprs.head, hashA, hashB, MinhashP),
      "scala_udf")
    val sig = docsets.select(col("doc_id"),
      expr("sort_array(transform(gs, g -> xxhash64(g)))").as("hs"),
      expr(
        s"graft_minhash(transform(gs, g -> pmod(xxhash64(g), ${MinhashP}L)))").as("sig"))
    val bandCols = (0 until NumHashes / BandRows).map { bnd =>
      val elems = (0 until BandRows)
        .map(r => s"sig[${bnd * BandRows + r}]").mkString(", ")
      expr(s"named_struct('band', $bnd, 'bsig', xxhash64($elems, $bnd))")
    }
    sig.select(col("doc_id"), col("hs"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("hs"), col("bb.band"), col("bb.bsig"))
  }

  private[operators] def bandedSigs(s: SparkSession, docsets: DataFrame): DataFrame = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash",
      exprs => graft.functions.MinHashSig(exprs.head, hashA, hashB, MinhashP),
      "scala_udf")
    val sig = docsets.select(col("doc_id"), expr(
      s"graft_minhash(transform(gs, g -> pmod(xxhash64(g), ${MinhashP}L)))").as("sig"))
    val bandCols = (0 until NumHashes / BandRows).map { bnd =>
      val elems = (0 until BandRows)
        .map(r => s"sig[${bnd * BandRows + r}]").mkString(", ")
      expr(s"named_struct('band', $bnd, 'bsig', xxhash64($elems, $bnd))")
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bsig"))
  }

  private val q45 = Q(
    "q45_minhash_lsh",
    jaccardOracle.replace("%THRESH%", "0.9")) { (s, dir) =>
    // MinHash signatures (64 perms) + LSH banding (16 bands x 4 rows):
    // the 100 TB dedup path. At j >= 0.9 the per-pair miss probability is
    // (1 - 0.9^4)^16 ~ 4e-8, so exact verification of candidates equals
    // the exact-Jaccard oracle.
    //
    // Plan shape (checked with .explain): the signature — the expensive
    // part — is computed ONCE per document by the codegen'd
    // [[graft.functions.MinHashSig]] (one fused pass for all 64 perms);
    // candidate pairs come from grouping by (band, band-sig) and exploding
    // in-bucket combinations (no self-join, so no second signature pass);
    // verification joins the (tiny) candidate list back to the doc
    // shingle-sets and intersects arrays per pair.
    val docsets = docShingleSets(s, dir)
    val banded = bandedSigs(s, docsets)
    // Bucket-size guard: a degenerate bucket (near-identical boilerplate,
    // empty docs) would make both the collect_list row and the in-bucket
    // pairing quadratic. Sizes are counted FIRST (cheap partial-agg
    // count, no materialized lists), over-cap buckets dropped before any
    // list is built. At j >= 0.9 a real near-dup pair collides in ~all
    // 16 bands, so losing one capped band leaves recall ~1; the cap is
    // far above any honest bucket at test scale (behavior identical for
    // the oracle) and exists for the 100 TB degenerate case.
    val maxBucket = 10000
    val okBuckets = banded.groupBy("band", "bsig")
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn") > 1 && col("bn") <= maxBucket)
      .select("band", "bsig")
    val candidates = banded.join(okBuckets, Seq("band", "bsig"))
      .groupBy("band", "bsig")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)),
          |            y -> struct(x AS d1, y AS d2))))""".stripMargin)).as("pr"))
      .select(col("pr.d1"), col("pr.d2")).distinct()
    val d1sets = docsets.select(col("doc_id").as("d1"), col("gs").as("gs1"))
    val d2sets = docsets.select(col("doc_id").as("d2"), col("gs").as("gs2"))
    candidates.join(d1sets, "d1").join(d2sets, "d2")
      .withColumn("inter", size(array_intersect(col("gs1"), col("gs2"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("gs1")) + size(col("gs2")) - col("inter")))
      .filter(col("jaccard") >= 0.9)
      .select("d1", "d2", "jaccard")
      .orderBy("d1", "d2")
  }

  // --------------------------------------------------------- SimHash

  /** DuckDB: per-word polynomial hash list with seed/multiplier (s, m). */
  private def duckWordHashes(seed: Int, mult: Int): String =
    s"""list_transform(string_split(text, ' '),
       |  w -> list_reduce(list_prepend(CAST($seed AS BIGINT),
       |         list_transform(range(1, length(w) + 1),
       |                        i -> CAST(ord(substring(w, i, 1)) AS BIGINT))),
       |       (acc, c) -> (acc * $mult + c) % 2147483647))""".stripMargin

  /** DuckDB: 31-bit simhash from a word-hash list column. */
  private def duckSim(hsCol: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(range(0, 31),
       |    j -> CASE WHEN list_sum(list_transform($hsCol,
       |           h -> 2 * ((h >> j) & 1) - 1)) > 0
       |         THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)),
       |  (acc, x) -> acc + x)""".stripMargin

  private val q46 = Q(
    "q46_simhash",
    s"""WITH wh AS (
       |  SELECT doc_id, ${duckWordHashes(17, 31)} AS hs1,
       |                 ${duckWordHashes(91, 37)} AS hs2
       |  FROM documents),
       |sims AS (
       |  SELECT doc_id, ${duckSim("hs1")} AS sim1, ${duckSim("hs2")} AS sim2
       |  FROM wh)
       |SELECT a.doc_id AS d1, b.doc_id AS d2,
       |  CAST(bit_count(xor(a.sim1, b.sim1)) + bit_count(xor(a.sim2, b.sim2)) AS BIGINT) AS hamming
       |FROM sims a JOIN sims b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sim1, b.sim1)) + bit_count(xor(a.sim2, b.sim2)) <= 3
       |ORDER BY d1, d2""".stripMargin) { (s, dir) =>
    // SimHash near-dup detection: 62-bit signature (two 31-bit words from
    // independent polynomial word hashes — mod at each step keeps every
    // intermediate < 2^36, so Spark long and DuckDB int128 agree).
    //
    // Scale shape: the char-level hash fold is computed once per DISTINCT
    // token (dictionary encoding — token frequency is zipfian, so the
    // vocabulary is tiny next to the corpus) and broadcast-joined back to
    // token occurrences; per-bit votes are then one codegen'd hash
    // aggregation over (doc_id) — no interpreted per-row array folds.
    // Banding: 4 bands of 15/16 bits; hamming<=3 pairs differ in at most
    // 3 bands, so any-band-equality has recall 1 by pigeonhole (4 > 3).
    // Wide bands are what makes this survive scale: candidate volume is
    // ~n²/2^bits per band, so 15-bit bands cut candidates 128× vs 8-bit
    // ones — the in-bucket pairing stays near-linear until n approaches
    // 2^15 docs *per bucket value*, and degenerate buckets are capped in
    // the LSH variant (q45). The oracle is the brute-force pair scan.
    // Codegen'd [[graft.functions.PolyHash]] — bit-identical to the SQL
    // fold `aggregate(transform(sequence(1,length(w)), i ->
    // ascii(substring(w,i,1))), seed, (acc,c) -> (acc*mult+c) % p)` the
    // oracle still uses, minus the interpreted HOF per distinct token.
    import org.apache.spark.sql.graftbridge.Bridge
    def charFold(seed: Int, mult: Int) = Bridge.column(
      graft.functions.PolyHash(Bridge.expr(col("w")), seed, mult, 2147483647L))
    val words = docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val vocab = words.select("w").distinct()
      .withColumn("h1", charFold(17, 31))
      .withColumn("h2", charFold(91, 37))
    val voteAggs =
      (0 until 31).map(j => sum(expr(s"2 * ((h1 >> $j) & 1) - 1")).as(s"v1_$j")) ++
      (0 until 31).map(j => sum(expr(s"2 * ((h2 >> $j) & 1) - 1")).as(s"v2_$j"))
    def packBits(prefix: String) = expr(
      (0 until 31).map(j => s"CASE WHEN ${prefix}_$j > 0 THEN ${1L << j}L ELSE 0L END")
        .mkString(" + "))
    val sims = words.join(broadcast(vocab), "w")
      .groupBy("doc_id").agg(voteAggs.head, voteAggs.tail: _*)
      .select(col("doc_id"), packBits("v1").as("sim1"), packBits("v2").as("sim2"))
    val bandCols = Seq(
      expr("named_struct('band', 0, 'bits', sim1 & 32767L)"),          // 15 bits
      expr("named_struct('band', 1, 'bits', (sim1 >> 15) & 65535L)"),  // 16 bits
      expr("named_struct('band', 2, 'bits', sim2 & 32767L)"),
      expr("named_struct('band', 3, 'bits', (sim2 >> 15) & 65535L)"))
    val banded = sims.select(col("doc_id"), col("sim1"), col("sim2"),
        explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("sim1"), col("sim2"), col("bb.band"), col("bb.bits"))
    val l = banded.select(col("doc_id").as("d1"), col("sim1").as("a1"),
      col("sim2").as("a2"), col("band"), col("bits"))
    val r = banded.select(col("doc_id").as("d2"), col("sim1").as("b1"),
      col("sim2").as("b2"), col("band"), col("bits"))
    l.join(r, Seq("band", "bits")).filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        (bit_count(col("a1").bitwiseXOR(col("b1"))) +
          bit_count(col("a2").bitwiseXOR(col("b2")))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("d1", "d2")
  }

  /** Unicode canonicalization surface: NFC for dedup keys ("é" ==
    * "e"+combining-acute after NFC, byte-different before) and accent
    * folding for fuzzy matching — both codegen expressions
    * (functions/UnicodeNorm.scala), semantics matched to DuckDB's
    * nfc_normalize / strip_accents (probed: café/Åström/ñ/Ώ/ß).
    * The gate corpus is ASCII (identity); the non-ASCII behavior is
    * pinned by TextNormSpec's fixed-expectation cases. */
  private val q180 = Q(
    "q180_unicode_normalize",
    """SELECT doc_id, text = nfc_normalize(text) AS is_nfc,
      |  length(strip_accents(text)) AS folded_len,
      |  strip_accents(text) = text AS accent_free
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    graft.Tables.registerAll(s, dir)
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc",
      exprs => graft.functions.NfcNormalize(exprs.head), "scala_udf")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_strip_accents",
      exprs => graft.functions.StripAccents(exprs.head), "scala_udf")
    s.sql(
      """SELECT doc_id, text = graft_nfc(text) AS is_nfc,
        |  CAST(length(graft_strip_accents(text)) AS BIGINT) AS folded_len,
        |  graft_strip_accents(text) = text AS accent_free
        |FROM documents ORDER BY doc_id""".stripMargin)
  }

  // ------------------------------- vocabulary construction (stable ids)

  /** Corpus vocabulary with STABLE integer ids — the dictionary-build
    * step every tokenizer training run starts from: token -> id where
    * ids are assigned by (frequency desc, token asc). The total order
    * makes ids reproducible run-to-run and engine-to-engine (frequency
    * alone is not total — ties are common in the long tail).
    *
    * Scale shape: the corpus-sized work is the token groupBy (one
    * shuffle, map-side combine); the global rank then runs on the
    * REDUCED vocabulary table (thousands-to-millions of rows, not the
    * corpus), so the single-partition window sort is bounded by vocab
    * size — the same reduction-before-global-sort shape as q26. */
  private val q197 = Q(
    "q197_vocab_build",
    """WITH toks AS (
      |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |c AS (SELECT tok, count(*) AS cnt FROM toks WHERE tok <> '' GROUP BY 1)
      |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, tok) - 1 AS BIGINT)
      |    AS token_id,
      |  tok AS token, cnt
      |FROM c ORDER BY token_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val c = docs(s, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    c.select(
        (row_number().over(Window.orderBy(col("cnt").desc, col("tok"))) - 1)
          .cast("long").as("token_id"),
        col("tok").as("token"), col("cnt"))
      .orderBy("token_id")
  }

  val defs: Seq[Q] =
    Seq(q40, q41, q42, q43, q44, q45, q46, q52, q53, q180, q197)
}
