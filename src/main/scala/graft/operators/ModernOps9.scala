package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 surfaces, part 9 — the flagship composition:
  *
  *  - q315 curation pipeline v2: exact dedup → hashed-linear quality
  *    gate (q303's classifier) → DSIR importance weighting over the
  *    SURVIVORS (q302's ratios — computed after the gate, the order
  *    real stacks use: selection distributions must reflect what the
  *    earlier stages let through) → top-k with full provenance.
  *    One tokenization feeds both models; every weight/ratio table is
  *    broadcast-sized; the only wide shuffles are the dedup, the two
  *    per-doc hash aggregates, and the survivor joins — all linear.
  */
object ModernOps9 {

  private val E2eTop = 100

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
       |    ${ModernOps4.duckPolyHash("w", 53, 41)} % 1024 AS b53,
       |    ${ModernOps4.duckPolyHash("w", 29, 33)} % 64 AS b29
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
      .withColumn("b53", ModernOps4.polyHash(col("w"), 53, 41) % 1024)
      .withColumn("b29", ModernOps4.polyHash(col("w"), 29, 33) % 64)
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

  val defs: Seq[Q] = Seq(q315)
}
