package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-9 surfaces, part 35 — dedup economics and revenue
  * concentration:
  *
  *  - q383 dedup-savings forecast: exact duplicate groups (hash of
  *    the raw text) summarized by GROUP SIZE — how many groups of
  *    each size, how many removable copies, and how many n_chars the
  *    dedup would reclaim (size−1 copies per group) — the number that
  *    justifies running the dedup at all, next to q40's actual dedup;
  *    one text-hash groupBy then a ≤ #groups rollup;
  *  - q384 revenue concentration: per market segment, the smallest
  *    number of customers covering ≥80% of segment revenue plus the
  *    exact Pareto share of the top decile — q373's coverage-curve
  *    machinery turned onto money, per group; ranking windows run
  *    inside each segment over ≤ #customers rows.
  */
object ModernOps35 {

  // ------------- q383: dedup savings forecast

  private val q383 = Q(
    "q383_dedup_savings",
    """WITH g AS (
      |  SELECT md5(text) AS h, count(*) AS sz, sum(n_chars) AS chars,
      |    max(n_chars) AS keep_chars
      |  FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL
      |  GROUP BY 1)
      |SELECT CAST(sz AS BIGINT) AS group_size,
      |  CAST(count(*) AS BIGINT) AS n_groups,
      |  CAST(sum(sz - 1) AS BIGINT) AS removable_docs,
      |  CAST(sum(chars - keep_chars) AS BIGINT) AS reclaimed_chars
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .filter(col("text").isNotNull && col("n_chars").isNotNull)
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(count(lit(1)).as("sz"), sum("n_chars").as("chars"),
        max("n_chars").as("keep_chars"))
      .groupBy(col("sz").cast("long").as("group_size"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("sz") - 1).as("removable_docs"),
        sum(col("chars") - col("keep_chars")).as("reclaimed_chars"))
      .select(col("group_size"),
        col("n_groups").cast("long").as("n_groups"),
        col("removable_docs").cast("long").as("removable_docs"),
        col("reclaimed_chars").cast("long").as("reclaimed_chars"))
      .orderBy("group_size")
  }

  // ------------- q384: revenue concentration per segment

  private val q384 = Q(
    "q384_revenue_concentration",
    """WITH rev AS (
      |  SELECT c.c_mktsegment AS seg, c.c_custkey AS ck,
      |    sum(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100
      |      AS BIGINT)) AS cents
      |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      |  WHERE c.c_custkey IS NOT NULL
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT seg, cents,
      |    row_number() OVER (PARTITION BY seg
      |      ORDER BY cents DESC, ck) AS rk,
      |    count(*) OVER (PARTITION BY seg) AS n,
      |    sum(cents) OVER (PARTITION BY seg) AS total
      |  FROM rev),
      |cum AS (
      |  SELECT seg, rk, n, total,
      |    sum(cents) OVER (PARTITION BY seg ORDER BY rk) AS cum
      |  FROM r)
      |SELECT seg, CAST(max(n) AS BIGINT) AS n_customers,
      |  CAST(max(total) AS BIGINT) AS total_cents,
      |  CAST(min(CASE WHEN cum * 10 >= total * 8 THEN rk END) AS BIGINT)
      |    AS p80_customers,
      |  CAST(max(CASE WHEN rk * 10 <= n THEN cum END) * 10000
      |    // max(total) AS BIGINT) AS top_decile_share_bp
      |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val rev = Tables.load(s, dir, "customer")
      .filter(col("c_custkey").isNotNull)
      .select(col("c_custkey").as("ck"), col("c_mktsegment").as("seg"))
      .join(Tables.load(s, dir, "orders")
        .select(col("o_custkey").as("ck"),
          (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
            .cast("long").as("cents")),
        "ck")
      .groupBy("seg", "ck").agg(sum("cents").as("cents"))
    val wSeg = Window.partitionBy("seg")
    val r = rev
      .withColumn("rk", row_number().over(
        wSeg.orderBy(col("cents").desc, col("ck"))))
      .withColumn("n", count(lit(1)).over(wSeg))
      .withColumn("total", sum("cents").over(wSeg))
      .withColumn("cum", sum("cents").over(
        wSeg.orderBy("rk")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    r.groupBy("seg")
      .agg(max("n").as("n_customers"), max("total").as("total_cents"),
        min(when(col("cum") * 10 >= col("total") * 8, col("rk")))
          .as("p80_customers"),
        max(when(col("rk") * 10 <= col("n"), col("cum")))
          .as("top_decile_cum"))
      .select(col("seg"),
        col("n_customers").cast("long").as("n_customers"),
        col("total_cents").cast("long").as("total_cents"),
        col("p80_customers").cast("long").as("p80_customers"),
        expr("top_decile_cum * 10000 div total_cents").cast("long")
          .as("top_decile_share_bp"))
      .orderBy("seg")
  }

  val defs: Seq[Q] = Seq(q383, q384)
}
