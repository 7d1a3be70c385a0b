package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-9 surfaces, part 36 — fulfillment SLAs and mix drift:
  *
  *  - q385 lead-time box stats: per order priority the exact
  *    min/p50/p90/max of first-fulfillment lag (days from order date
  *    to the order's FIRST ship date) — percentiles as true order
  *    statistics at ranks ⌈n/2⌉/⌈9n/10⌉ picked by per-group
  *    row_number in a (lag, key) total order, not interpolation (the
  *    q285 ordered-set aggregates are the other family); per-order
  *    min-ship is one linear shuffle, ranks run inside each priority;
  *  - q386 quarterly mix drift: revenue share of each priority within
  *    its quarter in exact bp, plus the quarter-over-quarter share
  *    delta per priority (lag window over the ≤ #quarters×5 mix
  *    table) — the business-mix monitor catching a channel quietly
  *    taking over.
  */
object ModernOps36 {

  private val q385 = Q(
    "q385_leadtime_box",
    """WITH lead AS (
      |  SELECT o.o_orderpriority AS pri, o.o_orderkey AS k,
      |    datediff('day', CAST(o.o_orderdate AS DATE),
      |      min(CAST(l.l_shipdate AS DATE))) AS lag_days
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  WHERE o.o_orderdate IS NOT NULL AND l.l_shipdate IS NOT NULL
      |  GROUP BY 1, 2, o.o_orderdate),
      |r AS (
      |  SELECT pri, lag_days,
      |    row_number() OVER (PARTITION BY pri ORDER BY lag_days, k)
      |      AS rk,
      |    count(*) OVER (PARTITION BY pri) AS n
      |  FROM lead)
      |SELECT pri, CAST(max(n) AS BIGINT) AS n,
      |  CAST(min(lag_days) AS BIGINT) AS min_days,
      |  CAST(max(CASE WHEN rk = (n + 1) // 2 THEN lag_days END)
      |    AS BIGINT) AS p50_days,
      |  CAST(max(CASE WHEN rk = (n * 9 + 9) // 10 THEN lag_days END)
      |    AS BIGINT) AS p90_days,
      |  CAST(max(lag_days) AS BIGINT) AS max_days
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val lead = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate").isNotNull)
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("pri"),
        to_date(col("o_orderdate")).as("od"))
      .join(Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate").isNotNull)
        .select(col("l_orderkey").as("k"),
          to_date(col("l_shipdate")).as("sd")),
        "k")
      .groupBy("pri", "k", "od").agg(min("sd").as("first_ship"))
      .select(col("pri"), col("k"),
        datediff(col("first_ship"), col("od")).cast("long")
          .as("lag_days"))
    val w = Window.partitionBy("pri")
    val r = lead
      .withColumn("rk", row_number().over(
        w.orderBy(col("lag_days"), col("k"))))
      .withColumn("n", count(lit(1)).over(w))
    r.groupBy("pri")
      .agg(max("n").as("n"), min("lag_days").as("min_days"),
        max(when(col("rk") === expr("(n + 1) div 2"), col("lag_days")))
          .as("p50_days"),
        max(when(col("rk") === expr("(n * 9 + 9) div 10"),
          col("lag_days"))).as("p90_days"),
        max("lag_days").as("max_days"))
      .select(col("pri"), col("n").cast("long").as("n"),
        col("min_days").cast("long").as("min_days"),
        col("p50_days").cast("long").as("p50_days"),
        col("p90_days").cast("long").as("p90_days"),
        col("max_days").cast("long").as("max_days"))
      .orderBy("pri")
  }

  // ------------- q386: quarterly priority-mix drift

  private val q386 = Q(
    "q386_mix_drift",
    """WITH o AS (
      |  SELECT (CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) * 12
      |      + month(CAST(o_orderdate AS DATE)) - 1) // 3 AS quarter,
      |    o_orderpriority AS pri,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders
      |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL),
      |mix AS (
      |  SELECT quarter, pri, sum(cents) AS cents FROM o GROUP BY 1, 2),
      |tot AS (
      |  SELECT quarter, sum(cents) AS total FROM mix GROUP BY 1),
      |share AS (
      |  SELECT m.quarter, m.pri, m.cents,
      |    m.cents * 10000 // t.total AS share_bp
      |  FROM mix m JOIN tot t ON t.quarter = m.quarter)
      |SELECT CAST(quarter AS BIGINT) AS quarter, pri,
      |  CAST(cents AS BIGINT) AS cents,
      |  CAST(share_bp AS BIGINT) AS share_bp,
      |  CAST(share_bp - lag(share_bp) OVER (PARTITION BY pri
      |    ORDER BY quarter) AS BIGINT) AS qoq_drift_bp
      |FROM share ORDER BY quarter, pri""".stripMargin) { (s, dir) =>
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .select(
        expr("(year(CAST(o_orderdate AS DATE)) * 12L" +
          " + month(CAST(o_orderdate AS DATE)) - 1) div 3").as("quarter"),
        col("o_orderpriority").as("pri"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast("long")
          .as("cents"))
    val mix = o.groupBy("quarter", "pri").agg(sum("cents").as("cents"))
    val tot = mix.groupBy("quarter").agg(sum("cents").as("total"))
    mix.join(broadcast(tot), "quarter")
      .withColumn("share_bp", expr("cents * 10000 div total"))
      .withColumn("qoq_drift_bp",
        col("share_bp") - lag("share_bp", 1).over(
          Window.partitionBy("pri").orderBy("quarter")))
      .select(col("quarter").cast("long").as("quarter"), col("pri"),
        col("cents").cast("long").as("cents"),
        col("share_bp").cast("long").as("share_bp"),
        col("qoq_drift_bp").cast("long").as("qoq_drift_bp"))
      .orderBy("quarter", "pri")
  }

  val defs: Seq[Q] = Seq(q385, q386)
}
