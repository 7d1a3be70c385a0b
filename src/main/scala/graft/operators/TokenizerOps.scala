package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Tokenizer-training surface — the third leg of the BPE family:
  * q246 counts pairs (one round), q283 applies a FIXED merge table;
  * q388 LEARNS the merge table, the iterative vocabulary-induction
  * loop itself (Sennrich et al. 2016, "Neural Machine Translation of
  * Rare Words with Subword Units" — the published BPE algorithm).
  */
object TokenizerOps {

  private val BpeRounds = 8

  /** The classic BPE scale trick both sides use: train on the DISTINCT
    * word table weighted by frequency (Zipf collapses the corpus by
    * orders of magnitude), never on raw tokens. One corpus-derived
    * aggregation per merge round; the only driver-side data is the
    * single winning pair per round (metadata-bounded, q307 precedent).
    *
    * Merge semantics match q283's apply side: left-to-right
    * non-overlapping space-delimited replace — the documented
    * simplification of the repo's BPE family (immediately-adjacent
    * repeats of the same pair merge once per non-overlapping window).
    * The oracle unrolls the identical rounds in DuckDB (MATERIALIZED
    * CTEs), with the identical (count DESC, pair ASC) tie-break, so
    * any drift in counting, merging, or tie-breaking diverges. */
  private def bpeTrainOracle: String = {
    def pairCounts(src: String, p: String): String =
      s"""$p AS MATERIALIZED (
         |  SELECT pair, CAST(sum(cnt) AS BIGINT) AS n FROM (
         |    SELECT cnt, unnest(list_transform(range(1, len(syms)),
         |      i -> syms[CAST(i AS INT)] || ' ' || syms[CAST(i + 1 AS INT)]))
         |      AS pair
         |    FROM (SELECT cnt, regexp_split_to_array(trim(s), ' ') AS syms
         |          FROM $src))
         |  GROUP BY pair)""".stripMargin
    val rounds = (1 to BpeRounds).map { k =>
      val prev = s"w${k - 1}"
      s"""${pairCounts(prev, s"p$k")},
         |b$k AS MATERIALIZED (
         |  SELECT $k AS step, pair, n FROM p$k
         |  ORDER BY n DESC, pair LIMIT 1),
         |w$k AS MATERIALIZED (
         |  SELECT w.cnt,
         |    replace(w.s, ' ' || b.pair || ' ',
         |            ' ' || replace(b.pair, ' ', '') || ' ') AS s
         |  FROM $prev w, b$k b)""".stripMargin
    }.mkString(",\n")
    val all = (1 to BpeRounds).map(k => s"SELECT * FROM b$k")
      .mkString(" UNION ALL ")
    s"""WITH words AS MATERIALIZED (
       |  SELECT w, count(*) AS cnt FROM (
       |    SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
       |    FROM documents)
       |  WHERE length(w) > 1 GROUP BY w),
       |w0 AS MATERIALIZED (
       |  SELECT cnt, ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS s
       |  FROM words),
       |$rounds
       |SELECT CAST(step AS INT) AS step,
       |  split_part(pair, ' ', 1) AS lft,
       |  split_part(pair, ' ', 2) AS rgt,
       |  replace(pair, ' ', '') AS merged, n
       |FROM ($all) ORDER BY step""".stripMargin
  }

  private val q388 = Q("q388_bpe_train", bpeTrainOracle) { (s, dir) =>
    import s.implicits._
    // distinct-word table, then words as space-delimited symbol strings
    var words = Tables.load(s, dir, "documents")
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .filter(length(col("w")) > 1)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("cnt"),
        concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 ")).as("s"))
      .localCheckpoint() // truncate lineage: each round rewrites `s`
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var k = 1
    var exhausted = false
    while (k <= BpeRounds && !exhausted) {
      // one aggregation per merge round: adjacent-pair counts over the
      // weighted word table, argmax by (n DESC, pair ASC)
      val best = words
        .withColumn("syms", split(trim(col("s")), " "))
        .filter(size(col("syms")) >= 2) // sequence(1,0) would descend
        .select(col("cnt"), explode(expr(
          """transform(sequence(1, size(syms) - 1),
            |  i -> concat(element_at(syms, i), ' ',
            |              element_at(syms, i + 1)))""".stripMargin))
          .as("pair"))
        .groupBy("pair").agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("pair")) // TakeOrdered(1): no global sort
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val pair = best.head.getString(0)
        val n = best.head.getLong(1)
        val Array(a, b) = pair.split(' ')
        merges += ((k, a, b, a + b, n))
        words = words
          .withColumn("s",
            expr(s"replace(s, ' $a $b ', ' $a$b ')"))
          .localCheckpoint()
        k += 1
      }
    }
    merges.result().toDF("step", "lft", "rgt", "merged", "n")
      .orderBy("step")
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
  // ------------- q409: unigram-LM tokenizer trainer (SentencePiece leg)

  private val UniMaxPiece = 3
  private val UniMultiVocab = 256
  private val UniIters = 2
  private val UniTopOut = 40

  /** Shared recursion: enumerate EVERY segmentation of every word under
    * the cost table `costs`, take the (cost, np, cutmask) minimum per
    * word — cutmask uniquely identifies a segmentation, so the winner
    * is total-order unique — and sum the winning pieces' word counts.
    * The Spark side's DP provably picks the same winner (the triple is
    * integer and extension-monotone; see
    * [[graft.functions.UnigramViterbi]]). */
  private def uniViterbiCtes(it: Int, costs: String): String = {
    val lens = (1 to UniMaxPiece).map(l => s"($l)").mkString(",")
    s"""r$it AS (
       |  SELECT w, cnt, 0 AS pos, CAST(0 AS BIGINT) AS cost, 0 AS np,
       |    CAST(0 AS BIGINT) AS cutmask, CAST('' AS VARCHAR) AS pieces
       |  FROM words
       |  UNION ALL
       |  SELECT e.w, e.cnt, e.pos + e.l, e.cost + v.cost, e.np + 1,
       |    e.cutmask + CASE WHEN e.pos + e.l < length(e.w)
       |      THEN (CAST(1 AS BIGINT) << (e.pos + e.l)) ELSE 0 END,
       |    e.pieces || v.piece || ','
       |  FROM (SELECT r$it.*, l, substr(r$it.w, r$it.pos + 1, l) AS cand
       |        FROM r$it CROSS JOIN (VALUES $lens) t(l)
       |        WHERE r$it.pos + l <= length(r$it.w)) e
       |  JOIN $costs v ON v.piece = e.cand),
       |seg$it AS MATERIALIZED (
       |  SELECT w, cnt, pieces FROM (
       |    SELECT w, cnt, pieces, ROW_NUMBER() OVER (
       |      PARTITION BY w ORDER BY cost, np, cutmask) AS rn
       |    FROM r$it WHERE pos = length(w)) WHERE rn = 1),
       |u$it AS MATERIALIZED (
       |  SELECT piece, CAST(sum(cnt) AS BIGINT) AS n FROM (
       |    SELECT cnt, unnest(string_split(rtrim(pieces, ','), ',')) AS piece
       |    FROM seg$it)
       |  GROUP BY piece)""".stripMargin
  }

  private def unigramOracle: String = {
    s"""WITH RECURSIVE words AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
       |    SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
       |    FROM documents)
       |  WHERE length(w) BETWEEN 2 AND ${graft.functions.UnigramViterbi.MaxWordLen}
       |  GROUP BY w),
       |subs AS MATERIALIZED (
       |  SELECT piece, CAST(sum(cnt) AS BIGINT) AS n FROM (
       |    SELECT cnt, unnest(flatten(list_transform(
       |      range(1, length(w) + 1),
       |      i -> list_transform(
       |        range(1, least($UniMaxPiece, length(w) - i + 1) + 1),
       |        l -> substr(w, CAST(i AS INT), CAST(l AS INT)))))) AS piece
       |    FROM words)
       |  GROUP BY piece),
       |v0 AS MATERIALIZED (
       |  SELECT piece, n FROM subs WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT piece, n FROM (
       |    SELECT piece, n, ROW_NUMBER() OVER (ORDER BY n DESC, piece) AS r
       |    FROM subs WHERE length(piece) >= 2) WHERE r <= $UniMultiVocab),
       |c1 AS MATERIALIZED (
       |  SELECT piece, CAST(64 - length(bin(n)) AS BIGINT) AS cost FROM v0),
       |${uniViterbiCtes(1, "c1")},
       |c2 AS MATERIALIZED (
       |  SELECT v0.piece,
       |    CAST(64 - length(bin(COALESCE(u1.n, 0) + 1)) AS BIGINT) AS cost
       |  FROM v0 LEFT JOIN u1 ON u1.piece = v0.piece),
       |${uniViterbiCtes(2, "c2")}
       |SELECT CAST(r AS BIGINT) AS rank, piece, n FROM (
       |  SELECT piece, n, ROW_NUMBER() OVER (ORDER BY n DESC, piece) AS r
       |  FROM u2)
       |WHERE r <= $UniTopOut ORDER BY rank""".stripMargin
  }

  /** q409: a SentencePiece-style UNIGRAM-LM tokenizer trainer — the
    * non-BPE leg of subword vocabulary induction (Kudo 2018,
    * "Subword Regularization"). Hard-EM, everything integer so both
    * engines are bit-exact:
    *
    *  - candidate vocab = all single characters + the top
    *    [[UniMultiVocab]] multi-character substrings (length ≤
    *    [[UniMaxPiece]]) by multiplicity-weighted corpus count;
    *  - E-step: Viterbi-best segmentation of each distinct word under
    *    integer piece costs `64 − bitLength(count)` (a quantized
    *    −log2 — the length(bin(n)) portability trick), ties broken by
    *    (fewer pieces, lowest cut-bitmask); piece usage is summed
    *    weighted by word frequency;
    *  - M-step: counts ← usage + 1 (add-one smoothing keeps every
    *    vocab piece alive so segmentability is invariant);
    *  - [[UniIters]] rounds, then the top [[UniTopOut]] pieces by
    *    final usage.
    *
    * Scale design (q388's): train on the DISTINCT word table weighted
    * by frequency, one distributed Viterbi pass + one vocab-bounded
    * aggregation per round (the driver holds only the ≤ 26 +
    * [[UniMultiVocab]] piece/count pairs — centroid-style metadata);
    * the per-word DP runs as a primitive loop called from codegen
    * ([[graft.functions.UnigramViterbi]]). The oracle replays the same
    * rounds by enumerating all segmentations per word and taking the
    * identical (cost, np, cutmask) minimum — exponential in word
    * length, hence the shared `MaxWordLen` bound. */
  private val q409 = Q("q409_unigram_lm_train", unigramOracle) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.graftbridge.Bridge
    import graft.functions.UnigramViterbi
    def bitLen(n: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(n)
    val words = Tables.load(s, dir, "documents")
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .filter(length(col("w")).between(2, UnigramViterbi.MaxWordLen))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    // init counts: every substring occurrence (with multiplicity),
    // weighted by word frequency — one explode + one aggregation;
    // the result is vocab-alphabet bounded (≤ 26 + 26² + 26³ rows)
    val subs = words.select(col("cnt"), explode(expr(
      s"""flatten(transform(sequence(1, length(w)),
         |  i -> transform(sequence(1, least($UniMaxPiece, length(w) - i + 1)),
         |    l -> substring(w, i, l))))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum("cnt").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val singles = subs.filter(_._1.length == 1)
    val multis = subs.filter(_._1.length >= 2)
      .sortBy { case (p, n) => (-n, p) }.take(UniMultiVocab)
    var vocabCounts: Array[(String, Long)] = singles ++ multis
    if (vocabCounts.isEmpty) {
      // a corpus with no [a-z] words trains nothing (adversarial edge)
      Seq.empty[(Long, String, Long)].toDF("rank", "piece", "n")
    } else {
      var usage: Array[(String, Long)] = Array.empty
      for (_ <- 1 to UniIters) {
        val costs = vocabCounts
          .map { case (p, n) => (p, 64 - bitLen(n)) }
        // one distributed pass: Viterbi-segment every distinct word,
        // weight the winning pieces by word frequency
        usage = words.withColumn("pieces",
            Bridge.column(UnigramViterbi(Bridge.expr(col("w")), costs)))
          .select(col("cnt"), explode(col("pieces")).as("piece"))
          .groupBy("piece").agg(sum("cnt").as("n"))
          .collect().map(r => (r.getString(0), r.getLong(1)))
        val u = usage.toMap
        vocabCounts = vocabCounts.map { case (p, _) =>
          (p, u.getOrElse(p, 0L) + 1L) } // add-one smoothing
      }
      usage.sortBy { case (p, n) => (-n, p) }.take(UniTopOut)
        .zipWithIndex
        .map { case ((p, n), i) => (i + 1L, p, n) }.toSeq
        .toDF("rank", "piece", "n")
        .orderBy("rank")
    }
  }

  val defs: Seq[Q] = Seq(q283, q388, q409)
}
