package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-9 surfaces, part 13 — bitmap indexes, leakage-free feature
  * encoding, and ranking evaluation:
  *
  *  - q325 bitmap-index set operations: per-segment user bitmaps
  *    (32-bit words packed into BIGINTs, `bit_or` aggregated) give
  *    intersection / union / Jaccard between audience sets from
  *    word-aligned `bit_count` sums — the roaring-bitmap pattern where
  *    set ops cost O(words), not O(members), and the bitmap build is
  *    one partial-aggregated shuffle with no pre-dedup;
  *  - q326 leave-one-out target encoding: each doc's category is
  *    encoded by the label mean of the OTHER members of its category
  *    (singleton categories fall back to the leave-one-out global
  *    prior) — the leakage-free categorical encoder for quality
  *    classifiers, exact in integer basis points;
  *  - q327 retrieval evaluation (MRR + graded nDCG@5): per user, the
  *    even-id half of events ranks event types (the "retrieval"), the
  *    odd-id half grades relevance; DCG weights are integer-literal
  *    micro-units of 1/log2(i+1), so both engines sum exact integers.
  */
object ModernOps13 {

  // ------------- q325: bitmap-index set operations

  /** Word-packed bitmaps over non-negative user ids (the bitmap
    * domain; negative ids would need an offset pass — documented
    * contract, filtered identically on both sides). */
  private val q325 = Q(
    "q325_bitmap_set_ops",
    """WITH e AS (
      |  SELECT event_type AS t, user_id AS uid FROM events
      |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
      |    AND user_id >= 0),
      |bm AS (
      |  SELECT t, uid // 32 AS word,
      |    bit_or(CAST(1 AS BIGINT) << CAST(uid % 32 AS INT)) AS mask
      |  FROM e GROUP BY 1, 2),
      |tot AS (SELECT t, sum(bit_count(mask)) AS n FROM bm GROUP BY 1),
      |ovl AS (
      |  SELECT a.t AS t1, b.t AS t2,
      |    sum(bit_count(a.mask & b.mask)) AS n_and
      |  FROM bm a JOIN bm b ON a.word = b.word AND a.t < b.t
      |  GROUP BY 1, 2)
      |SELECT p1.t AS t1, p2.t AS t2,
      |  CAST(p1.n AS BIGINT) AS n1, CAST(p2.n AS BIGINT) AS n2,
      |  CAST(coalesce(o.n_and, 0) AS BIGINT) AS n_and,
      |  CAST(p1.n + p2.n - coalesce(o.n_and, 0) AS BIGINT) AS n_or,
      |  CAST(coalesce(o.n_and, 0) * 100
      |    // (p1.n + p2.n - coalesce(o.n_and, 0)) AS BIGINT) AS jacc_pct
      |FROM tot p1 JOIN tot p2 ON p1.t < p2.t
      |LEFT JOIN ovl o ON o.t1 = p1.t AND o.t2 = p2.t
      |ORDER BY t1, t2""".stripMargin) { (s, dir) =>
    val e = Tables.load(s, dir, "events")
      .filter(col("event_type").isNotNull && col("user_id").isNotNull &&
        col("user_id") >= 0)
      .select(col("event_type").as("t"), col("user_id").as("uid"))
    // bit_or absorbs duplicate (user, type) rows — no distinct pass.
    val bm = e
      .select(col("t"), expr("uid div 32").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(uid % 32 AS INT))")
          .as("m"))
      .groupBy("t", "word").agg(expr("bit_or(m)").as("mask"))
      .localCheckpoint() // bitmap segments reused by totals + overlaps
    val tot = bm.groupBy("t").agg(sum(expr("bit_count(mask)")).as("n"))
    val ovl = bm.as("a")
      .join(bm.as("b"),
        col("a.word") === col("b.word") && col("a.t") < col("b.t"))
      .groupBy(col("a.t").as("t1"), col("b.t").as("t2"))
      .agg(sum(expr("bit_count(a.mask & b.mask)")).as("n_and"))
    tot.as("p1").join(tot.as("p2"), col("p1.t") < col("p2.t"))
      .join(ovl,
        ovl("t1") === col("p1.t") && ovl("t2") === col("p2.t"), "left")
      .select(col("p1.t").as("t1"), col("p2.t").as("t2"),
        col("p1.n").cast("long").as("n1"),
        col("p2.n").cast("long").as("n2"),
        coalesce(col("n_and"), lit(0L)).cast("long").as("n_and"))
      .withColumn("n_or", col("n1") + col("n2") - col("n_and"))
      .withColumn("jacc_pct", expr("n_and * 100 div n_or"))
      .orderBy("t1", "t2")
  }

  // ------------- q326: leave-one-out target encoding

  private val q326 = Q(
    "q326_target_encoding_loo",
    """WITH d AS (
      |  SELECT doc_id, source AS cat,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents
      |  WHERE doc_id IS NOT NULL AND source IS NOT NULL
      |    AND lang IS NOT NULL),
      |w AS (
      |  SELECT doc_id, cat, y,
      |    count(*) OVER (PARTITION BY cat) AS c_n,
      |    sum(y) OVER (PARTITION BY cat) AS c_y,
      |    count(*) OVER () AS t_n,
      |    sum(y) OVER () AS t_y
      |  FROM d),
      |enc AS (
      |  SELECT doc_id, cat, y,
      |    CASE WHEN c_n > 1 THEN c_y - y ELSE t_y - y END AS num,
      |    CASE WHEN c_n > 1 THEN c_n - 1 ELSE t_n - 1 END AS den
      |  FROM w)
      |SELECT doc_id, cat, CAST(y AS BIGINT) AS y,
      |  CAST(num AS BIGINT) AS num, CAST(den AS BIGINT) AS den,
      |  CAST(CASE WHEN den > 0 THEN num * 10000 // den ELSE 0 END
      |    AS BIGINT) AS enc_bp
      |FROM enc ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val d = Tables.load(s, dir, "documents")
      .filter(col("doc_id").isNotNull && col("source").isNotNull &&
        col("lang").isNotNull)
      .select(col("doc_id"), col("source").as("cat"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
    // Per-category stats shuffle on cat; the global prior is a 1-row
    // aggregate broadcast back — no OVER () single-partition window.
    val byCat = Window.partitionBy("cat")
    val tot = d.agg(count(lit(1)).as("t_n"), sum("y").as("t_y"))
    d.withColumn("c_n", count(lit(1)).over(byCat))
      .withColumn("c_y", sum("y").over(byCat))
      .crossJoin(broadcast(tot))
      .withColumn("num", when(col("c_n") > 1, col("c_y") - col("y"))
        .otherwise(col("t_y") - col("y")))
      .withColumn("den", when(col("c_n") > 1, col("c_n") - 1)
        .otherwise(col("t_n") - 1))
      .select(col("doc_id"), col("cat"), col("y").cast("long").as("y"),
        col("num").cast("long").as("num"),
        col("den").cast("long").as("den"),
        when(col("den") > 0, expr("num * 10000 div den"))
          .otherwise(0L).cast("long").as("enc_bp"))
      .orderBy("doc_id")
  }

  // ------------- q327: retrieval evaluation (MRR + nDCG@5)

  /** Integer micro-unit DCG weights: round(1e6 / log2(i+1)) for
    * positions 1..5, precomputed so neither engine evaluates log2 at
    * run time (last-ulp libm differences can never flip a result). */
  private val DcgW = Seq(1000000L, 630930L, 500000L, 430677L, 386853L)

  private val q327 = Q(
    "q327_retrieval_eval_ndcg",
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type FROM events
       |  WHERE user_id IS NOT NULL AND event_id IS NOT NULL
       |    AND event_type IS NOT NULL),
       |tr AS (
       |  SELECT user_id, event_type, count(*) AS cnt
       |  FROM e WHERE event_id % 2 = 0 GROUP BY 1, 2),
       |ranked AS (
       |  SELECT user_id, event_type,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY cnt DESC, event_type) AS i
       |  FROM tr QUALIFY i <= 5),
       |te AS (
       |  SELECT user_id, event_type, count(*) AS rel
       |  FROM e WHERE event_id % 2 = 1 GROUP BY 1, 2),
       |w(i, wt) AS (VALUES ${DcgW.zipWithIndex
            .map { case (v, i) => s"(${i + 1}, ${v})" }.mkString(", ")}),
       |dcg AS (
       |  SELECT r.user_id,
       |    sum(coalesce(t.rel, 0) * w.wt) AS dcg_micro,
       |    min(CASE WHEN coalesce(t.rel, 0) > 0 THEN r.i END) AS fr
       |  FROM ranked r JOIN w ON w.i = r.i
       |  LEFT JOIN te t ON t.user_id = r.user_id
       |    AND t.event_type = r.event_type
       |  GROUP BY 1),
       |ideal AS (
       |  SELECT user_id, rel,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY rel DESC, event_type) AS i
       |  FROM te QUALIFY i <= 5),
       |idcg AS (
       |  SELECT ideal.user_id, sum(rel * w.wt) AS idcg_micro
       |  FROM ideal JOIN w ON w.i = ideal.i GROUP BY 1)
       |SELECT d.user_id,
       |  CAST(coalesce(10000 // d.fr, 0) AS BIGINT) AS rr_bp,
       |  CAST(d.dcg_micro AS BIGINT) AS dcg_micro,
       |  CAST(coalesce(g.idcg_micro, 0) AS BIGINT) AS idcg_micro,
       |  CAST(CASE WHEN coalesce(g.idcg_micro, 0) > 0
       |    THEN d.dcg_micro * 10000 // g.idcg_micro ELSE 0 END AS BIGINT)
       |    AS ndcg_bp
       |FROM dcg d LEFT JOIN idcg g ON g.user_id = d.user_id
       |ORDER BY d.user_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val e = Tables.load(s, dir, "events")
      .filter(col("user_id").isNotNull && col("event_id").isNotNull &&
        col("event_type").isNotNull)
      .select("user_id", "event_id", "event_type")
    val byUser = Window.partitionBy("user_id")
    val tr = e.filter(col("event_id") % 2 === 0)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
    val ranked = tr
      .withColumn("i", row_number().over(
        byUser.orderBy(col("cnt").desc, col("event_type"))))
      .filter(col("i") <= 5)
    val te = e.filter(col("event_id") % 2 === 1)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("rel"))
    val w = DcgW.zipWithIndex.map { case (v, i) => (i + 1, v) }
      .toDF("i", "wt")
    val dcg = ranked.join(broadcast(w), "i")
      .join(te.withColumnRenamed("rel", "rel0"),
        Seq("user_id", "event_type"), "left")
      .withColumn("rel", coalesce(col("rel0"), lit(0L)))
      .groupBy("user_id")
      .agg(sum(col("rel") * col("wt")).as("dcg_micro"),
        min(when(col("rel") > 0, col("i"))).as("fr"))
    val idcg = te
      .withColumn("i", row_number().over(
        byUser.orderBy(col("rel").desc, col("event_type"))))
      .filter(col("i") <= 5)
      .join(broadcast(w), "i")
      .groupBy("user_id").agg(sum(col("rel") * col("wt")).as("idcg_micro"))
    dcg.join(idcg, Seq("user_id"), "left")
      .select(col("user_id"),
        coalesce(expr("10000 div fr"), lit(0L)).cast("long").as("rr_bp"),
        col("dcg_micro").cast("long").as("dcg_micro"),
        coalesce(col("idcg_micro"), lit(0L)).cast("long")
          .as("idcg_micro"),
        when(coalesce(col("idcg_micro"), lit(0L)) > 0,
          expr("dcg_micro * 10000 div idcg_micro"))
          .otherwise(0L).cast("long").as("ndcg_bp"))
      .orderBy("user_id")
  }

  val defs: Seq[Q] = Seq(q325, q326, q327)
}
