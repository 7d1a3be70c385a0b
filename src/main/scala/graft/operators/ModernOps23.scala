package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-9 surfaces, part 23 — snapshot reconciliation and the
  * calendar spine:
  *
  *  - q355 snapshot diff: two snapshots of the orders table (derived
  *    deterministically from the fixture: key-mod drops on each side
  *    simulate adds/removes, key-mod price/status edits simulate
  *    updates) reconciled by a single full-outer join on the key —
  *    per status (added/removed/changed/unchanged) the row count and
  *    per-audited-column change counts, null-safe comparisons
  *    throughout. The data-migration acceptance report: one shuffle
  *    on the key, counts only, no row material in the result;
  *  - q356 calendar spine: a GENERATED date dimension (explode of
  *    `sequence(min_day, max_day)`) left-joined to daily order
  *    revenue so empty days survive with zeros — the fiscal rollup
  *    (Feb-start fiscal year/quarter, arithmetic only, no engine
  *    week/locale functions) then aggregates days, active days,
  *    orders, and exact revenue cents. Spine generation is O(#days)
  *    and the fact join is one linear shuffle.
  */
object ModernOps23 {

  // ------------- q355: snapshot reconciliation diff

  private val q355 = Q(
    "q355_snapshot_diff",
    """WITH base AS (
      |  SELECT o_orderkey AS k,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |      AS cents,
      |    o_orderstatus AS st, o_orderpriority AS pr
      |  FROM orders WHERE o_orderkey IS NOT NULL),
      |a AS (SELECT * FROM base WHERE k % 89 <> 0),
      |b AS (
      |  SELECT k,
      |    cents + CASE WHEN k % 31 = 0 THEN 100 ELSE 0 END AS cents,
      |    CASE WHEN k % 37 = 0 THEN 'X' ELSE st END AS st, pr
      |  FROM base WHERE k % 97 <> 0),
      |j AS (
      |  SELECT coalesce(a.k, b.k) AS k,
      |    a.k IS NOT NULL AS in_a, b.k IS NOT NULL AS in_b,
      |    a.cents IS DISTINCT FROM b.cents AS dc,
      |    a.st IS DISTINCT FROM b.st AS ds,
      |    a.pr IS DISTINCT FROM b.pr AS dp
      |  FROM a FULL OUTER JOIN b ON a.k = b.k),
      |cls AS (
      |  SELECT k,
      |    CASE WHEN NOT in_a THEN 'added'
      |         WHEN NOT in_b THEN 'removed'
      |         WHEN dc OR ds OR dp THEN 'changed'
      |         ELSE 'unchanged' END AS status,
      |    CASE WHEN in_a AND in_b AND dc THEN 1 ELSE 0 END AS pc,
      |    CASE WHEN in_a AND in_b AND ds THEN 1 ELSE 0 END AS sc,
      |    CASE WHEN in_a AND in_b AND dp THEN 1 ELSE 0 END AS rc
      |  FROM j)
      |SELECT status, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(pc) AS BIGINT) AS n_price_changed,
      |  CAST(sum(sc) AS BIGINT) AS n_status_changed,
      |  CAST(sum(rc) AS BIGINT) AS n_priority_changed
      |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val base = Tables.load(s, dir, "orders")
      .filter(col("o_orderkey").isNotNull)
      .select(col("o_orderkey").as("k"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast("long")
          .as("cents"),
        col("o_orderstatus").as("st"), col("o_orderpriority").as("pr"))
    val a = base.filter(col("k") % 89 =!= 0)
    val b = base.filter(col("k") % 97 =!= 0)
      .select(col("k"),
        (col("cents") + when(col("k") % 31 === 0, 100L).otherwise(0L))
          .as("cents"),
        when(col("k") % 37 === 0, "X").otherwise(col("st")).as("st"),
        col("pr"))
    val j = a.as("a").join(b.as("b"), col("a.k") === col("b.k"), "full")
      .select(col("a.k").isNotNull.as("in_a"),
        col("b.k").isNotNull.as("in_b"),
        (!(col("a.cents") <=> col("b.cents"))).as("dc"),
        (!(col("a.st") <=> col("b.st"))).as("ds"),
        (!(col("a.pr") <=> col("b.pr"))).as("dp"))
    j.select(
      when(!col("in_a"), "added")
        .when(!col("in_b"), "removed")
        .when(col("dc") || col("ds") || col("dp"), "changed")
        .otherwise("unchanged").as("status"),
      when(col("in_a") && col("in_b") && col("dc"), 1L).otherwise(0L)
        .as("pc"),
      when(col("in_a") && col("in_b") && col("ds"), 1L).otherwise(0L)
        .as("sc"),
      when(col("in_a") && col("in_b") && col("dp"), 1L).otherwise(0L)
        .as("rc"))
      .groupBy("status")
      .agg(count(lit(1)).as("n"), sum("pc").as("n_price_changed"),
        sum("sc").as("n_status_changed"),
        sum("rc").as("n_priority_changed"))
      .select(col("status"), col("n").cast("long").as("n"),
        col("n_price_changed").cast("long").as("n_price_changed"),
        col("n_status_changed").cast("long").as("n_status_changed"),
        col("n_priority_changed").cast("long").as("n_priority_changed"))
      .orderBy("status")
  }

  // ------------- q356: calendar spine + fiscal rollup

  private val q356 = Q(
    "q356_calendar_spine",
    """WITH bounds AS (
      |  SELECT min(CAST(o_orderdate AS DATE)) AS lo,
      |    max(CAST(o_orderdate AS DATE)) AS hi
      |  FROM orders WHERE o_orderdate IS NOT NULL),
      |spine AS (
      |  SELECT CAST(unnest(generate_series(lo, hi,
      |    INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
      |fact AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS orders,
      |    sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
      |      AS cents
      |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
      |enriched AS (
      |  SELECT s.day,
      |    year(s.day) + CASE WHEN month(s.day) >= 2 THEN 1 ELSE 0 END
      |      AS fy,
      |    ((month(s.day) + 10) % 12) // 3 + 1 AS fq,
      |    coalesce(f.orders, 0) AS orders, coalesce(f.cents, 0) AS cents
      |  FROM spine s LEFT JOIN fact f ON f.day = s.day)
      |SELECT CAST(fy AS BIGINT) AS fy, CAST(fq AS BIGINT) AS fq,
      |  CAST(count(*) AS BIGINT) AS n_days,
      |  CAST(sum(CASE WHEN orders > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS active_days,
      |  CAST(sum(orders) AS BIGINT) AS orders,
      |  CAST(sum(cents) AS BIGINT) AS cents
      |FROM enriched GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val orders = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate").isNotNull)
      .select(to_date(col("o_orderdate")).as("day"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast("long")
          .as("cents"))
    val spine = orders.agg(min("day").as("lo"), max("day").as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
    val fact = orders.groupBy("day")
      .agg(count(lit(1)).as("orders"), sum("cents").as("cents"))
    spine.join(fact, Seq("day"), "left")
      .select(col("day"),
        (year(col("day")) + when(month(col("day")) >= 2, 1).otherwise(0))
          .as("fy"),
        expr("((month(day) + 10) % 12) div 3 + 1").cast("long").as("fq"),
        coalesce(col("orders"), lit(0L)).as("orders"),
        coalesce(col("cents"), lit(0L)).as("cents"))
      .groupBy("fy", "fq")
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("orders") > 0, 1L).otherwise(0L)).as("active_days"),
        sum("orders").as("orders"), sum("cents").as("cents"))
      .select(col("fy").cast("long").as("fy"),
        col("fq").cast("long").as("fq"),
        col("n_days").cast("long").as("n_days"),
        col("active_days").cast("long").as("active_days"),
        col("orders").cast("long").as("orders"),
        col("cents").cast("long").as("cents"))
      .orderBy("fy", "fq")
  }

  val defs: Seq[Q] = Seq(q355, q356)
}
