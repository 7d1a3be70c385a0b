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

  val defs: Seq[Q] = Seq(q389, q390)
}
