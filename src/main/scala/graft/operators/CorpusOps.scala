package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Corpus-preparation surface for training-data pipelines: PII
  * scrubbing and context-window packing — the steps between raw
  * documents and model-ready shards.
  */
object CorpusOps {

  // ------------- q389: PII redaction pass

  /** Regexes kept to the Java∩RE2 common subset so Spark (java.util
    * .regex) and DuckDB (RE2) agree byte-for-byte. */
  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** PII scrub: every document is augmented with a deterministic
    * contact line (so the redactor provably fires on every row — the
    * corpus itself is synthetic and PII-free), then emails/phones are
    * counted and replaced with typed placeholder tokens. Output pins
    * counts AND the redacted length, so a regex that over- or
    * under-matches by one character diverges. The whole pass is
    * per-row codegen (regexp_count/regexp_replace) — no shuffle, scan
    * throughput is the only cost at 100 TB. */
  private val q389 = Q(
    "q389_pii_redact",
    s"""WITH aug AS (
       |  SELECT doc_id,
       |    COALESCE(text, '') || ' contact user' || abs(doc_id)
       |      || '@example.com or call 555-'
       |      || lpad(CAST(abs(doc_id) % 1000 AS VARCHAR), 3, '0') || '-'
       |      || lpad(CAST(abs(doc_id) % 10000 AS VARCHAR), 4, '0')
       |      || ' now' AS t
       |  FROM documents),
       |red AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(t, '$EmailRe')) AS INT) AS n_email,
       |    CAST(len(regexp_extract_all(t, '$PhoneRe')) AS INT) AS n_phone,
       |    regexp_replace(regexp_replace(t, '$EmailRe', '<EMAIL>', 'g'),
       |      '$PhoneRe', '<PHONE>', 'g') AS r
       |  FROM aug)
       |SELECT doc_id, n_email, n_phone,
       |  CAST(length(r) AS INT) AS redacted_len
       |FROM red ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val aug = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        concat(coalesce(col("text"), lit("")),
          lit(" contact user"), abs(col("doc_id")).cast("string"),
          lit("@example.com or call 555-"),
          lpad((abs(col("doc_id")) % 1000).cast("string"), 3, "0"),
          lit("-"),
          lpad((abs(col("doc_id")) % 10000).cast("string"), 4, "0"),
          lit(" now")).as("t"))
    aug
      .withColumn("n_email", regexp_count(col("t"), lit(EmailRe)).cast("int"))
      .withColumn("n_phone", regexp_count(col("t"), lit(PhoneRe)).cast("int"))
      .withColumn("r", regexp_replace(
        regexp_replace(col("t"), EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>"))
      .select(col("doc_id"), col("n_email"), col("n_phone"),
        length(col("r")).cast("int").as("redacted_len"))
      .orderBy("doc_id")
  }

  // ------------- q390: greedy context-window packing

  private val TokenBudget = 512

  case class DocTok(lang: String, doc_id: Long, n_tok: Int)
  case class Packed(lang: String, doc_id: Long, n_tok: Int, bin: Int, fill: Int)

  /** Greedy first-fit packing of documents into fixed token-budget
    * context windows, per language shard — how pre-training corpora
    * become fixed-length model inputs. Packing is inherently
    * sequential WITHIN a shard, so the shard key (here `lang`) is the
    * parallelism unit: `flatMapSortedGroups` gives each group a
    * secondary-sorted iterator (doc_id order) and the greedy fold runs
    * once per group, streaming — state is two ints, never the group's
    * rows. At 100 TB the shard key would be (lang, shard_id) with
    * shards sized to executors; the fold itself is unchanged. A doc
    * larger than the budget opens its own (overflowing) bin — the
    * convention both sides pin. Oracle: per-lang recursive CTE
    * replaying the same fold row by row. `fill` (running bin total)
    * pins every intermediate state, not just the final assignment. */
  private val q390 = Q(
    "q390_context_packing",
    s"""WITH RECURSIVE base AS (
       |  SELECT lang, doc_id,
       |    CAST(len(regexp_split_to_array(trim(text), '[ \\t\\n\\r]+')) AS INT)
       |      AS n_tok,
       |    row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
       |  FROM documents
       |  WHERE text IS NOT NULL AND trim(text) <> '' AND lang IS NOT NULL),
       |packed AS (
       |  SELECT lang, doc_id, n_tok, rn, 1 AS bin, n_tok AS fill
       |  FROM base WHERE rn = 1
       |  UNION ALL
       |  SELECT b.lang, b.doc_id, b.n_tok, b.rn,
       |    CASE WHEN p.fill + b.n_tok <= $TokenBudget
       |         THEN p.bin ELSE p.bin + 1 END,
       |    CASE WHEN p.fill + b.n_tok <= $TokenBudget
       |         THEN p.fill + b.n_tok ELSE b.n_tok END
       |  FROM base b JOIN packed p ON b.lang = p.lang AND b.rn = p.rn + 1)
       |SELECT lang, doc_id, n_tok, CAST(bin AS INT) AS bin,
       |  CAST(fill AS INT) AS fill
       |FROM packed ORDER BY lang, doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val base = Tables.load(s, dir, "documents")
      .filter(col("text").isNotNull && trim(col("text")) =!= "" &&
        col("lang").isNotNull)
      .select(col("lang"), col("doc_id"),
        size(split(trim(col("text")), "[ \\t\\n\\r]+")).cast("int").as("n_tok"))
      .as[DocTok]
    base.groupByKey(_.lang)
      .flatMapSortedGroups(col("doc_id")) { (lang, docs) =>
        var bin = 0
        var fill = TokenBudget + 1 // force the first doc to open bin 1
        docs.map { d =>
          if (fill + d.n_tok <= TokenBudget) fill += d.n_tok
          else { bin += 1; fill = d.n_tok }
          Packed(lang, d.doc_id, d.n_tok, bin, fill)
        }
      }
      .toDF()
      .orderBy("lang", "doc_id")
  }

  // ------------- q403: RAG-style overlapping chunking

  private val ChunkLen = 64
  private val ChunkStride = 48 // 16-token overlap between neighbors

  /** q403: retrieval-ingestion chunking — every document split into
    * [[ChunkLen]]-token windows advancing by [[ChunkStride]] (the
    * overlap keeps answers that straddle a boundary retrievable), the
    * standard RAG corpus-prep step. Chunk count is closed-form
    * (1 + ⌈(n−L)/S⌉ for n > L), per-chunk content is pinned by a
    * polynomial fingerprint of its tokens (mod at every step — the
    * q53 cross-engine fold), and the per-document aggregate keeps the
    * output linear in documents, not chunks, so the oracle sweeps at
    * 100x. One projection + one explode + one re-aggregation — no
    * shuffle beyond the groupBy, no UDF. */
  private val q403 = Q(
    "q403_chunk_overlap",
    s"""WITH tok AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
       |  FROM documents),
       |d AS (SELECT doc_id, ws, len(ws) AS n,
       |        CASE WHEN len(ws) <= $ChunkLen THEN 1
       |             ELSE 1 + (len(ws) - $ChunkLen + $ChunkStride - 1)
       |                  // $ChunkStride END AS k
       |      FROM tok WHERE len(ws) > 0),
       |st AS (SELECT doc_id, ws, n,
       |         unnest(range(0, k)) * $ChunkStride AS s FROM d),
       |ch AS (
       |  SELECT doc_id, n,
       |    ws[CAST(s + 1 AS INT):CAST(least(s + $ChunkLen, n) AS INT)] AS cw
       |  FROM st)
       |SELECT doc_id, CAST(max(n) AS BIGINT) AS n_tokens,
       |  CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(sum(len(cw)) AS BIGINT) AS sum_chunk_tokens,
       |  CAST(sum(list_reduce(list_prepend(CAST(7 AS BIGINT),
       |    list_transform(cw, w -> CAST(length(w) * 31 + ord(w) AS BIGINT))),
       |    (acc, x) -> (acc * 1000003 + x) % 2147483647)) % 2147483647
       |    AS BIGINT) AS chunks_fp
       |FROM ch GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        expr("filter(split(text, ' '), w -> w <> '')").as("ws"))
      .withColumn("n", size(col("ws")))
      .filter(col("n") > 0)
    val nChunks = expr(
      s"""CASE WHEN n <= $ChunkLen THEN 1
         |     ELSE 1 + CAST((n - $ChunkLen + $ChunkStride - 1) AS BIGINT)
         |          div $ChunkStride END""".stripMargin)
    d.withColumn("n_chunks_c", nChunks)
      .select(col("doc_id"), col("ws"), col("n"),
        explode(expr(s"transform(sequence(0, n_chunks_c - 1), " +
          s"c -> slice(ws, CAST(c * $ChunkStride + 1 AS INT), $ChunkLen))"))
          .as("cw"))
      .groupBy("doc_id")
      .agg(max(col("n")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_chunks"),
        sum(size(col("cw"))).cast("long").as("sum_chunk_tokens"),
        sum(expr(
          """aggregate(
            |  transform(cw, w -> CAST(length(w) * 31 + ascii(w) AS BIGINT)),
            |  7L, (acc, x) -> (acc * 1000003 + x) % 2147483647)"""
            .stripMargin)).mod(2147483647L).cast("long").as("chunks_fp"))
      .orderBy("doc_id")
  }

  // ------------- q404: bigram-novelty quality gate

  private val RareMax = 2 // corpus bigram count <= 2 => "rare"

  /** q404: count-based language-model quality gating without the
    * cross-engine log-float trap — a document's NOVELTY is the share
    * of its bigrams that are rare in the whole corpus (count ≤
    * [[RareMax]]); boilerplate scores near 0, lorem-noise near 10⁴ bp.
    * The corpus bigram table is one explode+groupBy (the q246 BPE
    * pair-count shape), docs join their own bigrams back against it —
    * an equi-join on the bigram key, linear at any scale — and the
    * output is pure integer basis points. The add-1-smoothed log-prob
    * variant of this gate differs only in the final map; the counts
    * pipeline IS the operator. */
  private val q404 = Q(
    "q404_bigram_novelty_gate",
    s"""WITH tok AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
       |  FROM documents),
       |ix AS (
       |  SELECT doc_id, ws,
       |    unnest(range(1, CAST(greatest(len(ws), 1) AS BIGINT))) AS i
       |  FROM tok),
       |bg AS (
       |  SELECT doc_id,
       |    ws[CAST(i AS INT)] || ' ' || ws[CAST(i + 1 AS INT)] AS b
       |  FROM ix),
       |cnt AS (SELECT b, COUNT(*) AS c FROM bg GROUP BY 1)
       |SELECT g.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_bigrams,
       |  CAST(count(*) FILTER (WHERE cnt.c <= $RareMax) AS BIGINT) AS n_rare,
       |  CAST(count(*) FILTER (WHERE cnt.c <= $RareMax) * 10000
       |    // count(*) AS BIGINT) AS rare_bp
       |FROM bg g JOIN cnt ON cnt.b = g.b
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val tok = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        expr("filter(split(text, ' '), w -> w <> '')").as("ws"))
    // CASE-guard, not greatest(): Spark's sequence(1, 0) DESCENDS
    val bg = tok
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(ws) >= 2
          |  THEN transform(sequence(1, size(ws) - 1),
          |    i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))
          |  ELSE array() END""".stripMargin)).as("b"))
    val cnt = bg.groupBy("b").agg(count(lit(1)).as("c"))
    bg.join(cnt, "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c") <= RareMax, 1L).otherwise(0L)).as("n_rare"))
      .select(col("doc_id"), col("n_bigrams").cast("long"),
        col("n_rare").cast("long"),
        expr("n_rare * 10000 div n_bigrams").cast("long").as("rare_bp"))
      .orderBy("doc_id")
  }

  val defs: Seq[Q] = Seq(q389, q390, q403, q404)
}
