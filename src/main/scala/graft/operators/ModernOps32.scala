package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 surfaces, part 32 — dataset splitting and sweep-line
  * backlog:
  *
  *  - q378 stratified train/val/test split: every (lang) stratum cut
  *    70/15/15 by EXACT rank allocation in a deterministic
  *    pseudo-random (hash, id) order — train gets ceil-leaning
  *    ⌈·7n/10⌉-style bounds via pure integer arithmetic (rk·10 ≤ 7n
  *    etc.), so split sizes are reproducible to the row, per stratum;
  *    outputs per (stratum, split) counts + an id checksum pinning
  *    membership. The ranking is per-stratum, never global;
  *  - q379 backlog sweep-line: "how many orders were OPEN (placed, not yet fully shipped) each
  *    day" — an interval-stabbing count computed NOT by joining days
  *    to intervals (that is q354's shape) but by the O(n) sweep: +1
  *    at open, −1 after close, cumulative-summed over the day spine.
  *    At 100 TB the delta table is 2 rows per order and the cumsum
  *    runs over ≤ #days rows — the cheapest correct form of the
  *    question, and the third member of the interval-query family
  *    (q354 containment join, q333 PIT, this).
  */
object ModernOps32 {

  private val M32 = 4294967296L

  private def hashSql(x: String): String =
    s"((($x) * 2654435761) % $M32 + $M32) % $M32"

  // ------------- q378: stratified 70/15/15 split

  private val q378 = Q(
    "q378_stratified_split",
    s"""WITH d AS (
       |  SELECT doc_id, lang, ${hashSql("doc_id")} AS h
       |  FROM documents WHERE doc_id IS NOT NULL AND lang IS NOT NULL),
       |r AS (
       |  SELECT lang, doc_id,
       |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)
       |      AS rk,
       |    count(*) OVER (PARTITION BY lang) AS n
       |  FROM d),
       |s AS (
       |  SELECT lang, doc_id,
       |    CASE WHEN rk * 10 <= n * 7 THEN 'train'
       |         WHEN rk * 20 <= n * 17 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM r)
       |SELECT lang, split, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum((doc_id % 1000003 + 1000003) % 1000003) AS BIGINT)
       |    AS checksum
       |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val d = Tables.load(s, dir, "documents")
      .filter(col("doc_id").isNotNull && col("lang").isNotNull)
      .select(col("doc_id"), col("lang"), expr(hashSql("doc_id")).as("h"))
    val w = Window.partitionBy("lang").orderBy("h", "doc_id")
    d.withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      .select(col("lang"), col("doc_id"),
        when(col("rk") * 10 <= col("n") * 7, "train")
          .when(col("rk") * 20 <= col("n") * 17, "val")
          .otherwise("test").as("split"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n"),
        sum(expr("(doc_id % 1000003 + 1000003) % 1000003"))
          .as("checksum"))
      .select(col("lang"), col("split"), col("n").cast("long").as("n"),
        col("checksum").cast("long").as("checksum"))
      .orderBy("lang", "split")
  }

  // ------------- q379: backlog sweep-line

  private val q379 = Q(
    "q379_backlog_sweep",
    """WITH iv AS (
      |  SELECT datediff('day', DATE '1970-01-01',
      |      CAST(o.o_orderdate AS DATE)) AS lo,
      |    datediff('day', DATE '1970-01-01',
      |      max(CAST(l.l_shipdate AS DATE))) AS hi
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  WHERE o.o_orderdate IS NOT NULL AND l.l_shipdate IS NOT NULL
      |  GROUP BY o.o_orderkey, o.o_orderdate),
      |deltas AS (
      |  SELECT lo AS d, 1 AS delta FROM iv WHERE lo <= hi
      |  UNION ALL
      |  SELECT hi + 1 AS d, -1 AS delta FROM iv WHERE lo <= hi),
      |agg AS (SELECT d, sum(delta) AS delta FROM deltas GROUP BY 1),
      |bounds AS (SELECT min(lo) AS mn, max(hi) AS mx FROM iv),
      |spine AS (
      |  SELECT unnest(range(
      |    (SELECT mn FROM bounds), (SELECT mx FROM bounds) + 1)) AS d),
      |merged AS (
      |  SELECT s.d, coalesce(a.delta, 0) AS delta
      |  FROM spine s LEFT JOIN agg a ON a.d = s.d)
      |SELECT CAST(d AS BIGINT) AS d,
      |  CAST(sum(delta) OVER (ORDER BY d) AS BIGINT) AS open_orders
      |FROM merged ORDER BY d""".stripMargin) { (s, dir) =>
    val iv = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate").isNotNull)
      .select(col("o_orderkey").as("ok"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")).as("lo"))
      .join(Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate").isNotNull)
        .select(col("l_orderkey").as("ok"),
          datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
            .as("rd")),
        "ok")
      .groupBy("ok", "lo").agg(max("rd").as("hi"))
      .filter(col("lo") <= col("hi"))
    val deltas = iv.select(col("lo").as("d"), lit(1L).as("delta"))
      .unionByName(iv.select((col("hi") + 1).as("d"),
        lit(-1L).as("delta")))
      .groupBy("d").agg(sum("delta").as("delta"))
    val bounds = iv.agg(min("lo").as("mn"), max("hi").as("mx"))
    val spine = bounds
      .select(explode(sequence(col("mn"), col("mx"))).as("d"))
    // the cumsum runs over ≤ #days rows — a sorted single partition of
    // a tiny relation, the whole point of the sweep form
    spine.join(deltas, Seq("d"), "left")
      .select(col("d"), coalesce(col("delta"), lit(0L)).as("delta"))
      .withColumn("open_orders", sum("delta").over(Window.orderBy("d")))
      .select(col("d").cast("long").as("d"),
        col("open_orders").cast("long").as("open_orders"))
      .orderBy("d")
  }

  val defs: Seq[Q] = Seq(q378, q379)
}
