package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Round-9 surfaces, part 30 — vocabulary economics and join
  * pre-flight:
  *
  *  - q373 vocabulary coverage curve: terms ranked by corpus frequency
  *    (deterministic (freq DESC, term) order via ScalableRank), the
  *    running token mass accumulated, and for each coverage target
  *    (50/90/99%) the SMALLEST vocabulary size whose cumulative mass
  *    clears it — the number that decides a tokenizer's vocab size;
  *    term counting is one linear explode+groupBy, the curve runs over
  *    ≤ #terms rows;
  *  - q374 join-blowup audit: for a proposed orders⋈lineitem-style
  *    join ON a key, the EXACT output cardinality Σ nA(k)·nB(k) from
  *    the two per-key count tables, global multiplicity maxima, and
  *    the top contributing key — the deterministic twin of q345's
  *    CM-sketch estimate (sketch when you can't afford two passes,
  *    this when you can); never materializes the join itself.
  */
object ModernOps30 {

  private val Targets = Seq(5000, 9000, 9900) // bp of token mass

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

  // ------------- q374: exact join-blowup audit

  private val q374 = Q(
    "q374_join_blowup_audit",
    """WITH a AS (
      |  SELECT o_custkey AS k, count(*) AS na FROM orders
      |  WHERE o_custkey IS NOT NULL GROUP BY 1),
      |b AS (
      |  SELECT c_nationkey % 100 AS k, count(*) AS nb FROM customer
      |  WHERE c_nationkey IS NOT NULL GROUP BY 1),
      |j AS (
      |  SELECT a.k, a.na, b.nb, a.na * b.nb AS contrib
      |  FROM a JOIN b ON a.k % 100 = b.k),
      |hot AS (SELECT k FROM j ORDER BY contrib DESC, k LIMIT 1)
      |SELECT
      |  CAST((SELECT sum(contrib) FROM j) AS BIGINT) AS out_rows,
      |  CAST((SELECT max(na) FROM j) AS BIGINT) AS max_left,
      |  CAST((SELECT max(nb) FROM j) AS BIGINT) AS max_right,
      |  CAST((SELECT k FROM hot) AS BIGINT) AS hottest_key,
      |  CAST((SELECT count(*) FROM j) AS BIGINT) AS n_join_keys""".stripMargin) {
    (s, dir) =>
    val a = Tables.load(s, dir, "orders")
      .filter(col("o_custkey").isNotNull)
      .groupBy(col("o_custkey").as("k"))
      .agg(count(lit(1)).as("na"))
    val b = Tables.load(s, dir, "customer")
      .filter(col("c_nationkey").isNotNull)
      .groupBy((col("c_nationkey") % 100).as("k2"))
      .agg(count(lit(1)).as("nb"))
    val j = a.join(b, expr("k % 100") === col("k2"))
      .select(col("k"), col("na"), col("nb"),
        (col("na") * col("nb")).as("contrib"))
    val hot = j.orderBy(col("contrib").desc, col("k")).limit(1)
      .select(col("k").as("hottest_key"))
    j.agg(sum("contrib").as("out_rows"), max("na").as("max_left"),
        max("nb").as("max_right"), count(lit(1)).as("n_join_keys"))
      .crossJoin(hot)
      .select(col("out_rows").cast("long").as("out_rows"),
        col("max_left").cast("long").as("max_left"),
        col("max_right").cast("long").as("max_right"),
        col("hottest_key").cast("long").as("hottest_key"),
        col("n_join_keys").cast("long").as("n_join_keys"))
  }

  val defs: Seq[Q] = Seq(q373, q374)
}
