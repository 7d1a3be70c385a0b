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
  val defs: Seq[Q] = Seq(q283, q388)
}
