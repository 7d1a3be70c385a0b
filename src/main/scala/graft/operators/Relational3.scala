package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Third batch: datetime/string/math/conditional/array function surface
  * (SURVEY §2.2/§2.11 — the reference has no function catalog, so
  * Spark's FunctionRegistry is the strict superset we expose) and two
  * more TPC-H-shaped headline joins.
  *
  * Math functions are restricted to IEEE-exact operations (sqrt is
  * correctly rounded; pow/log/exp are libm-dependent and would not
  * hash-match across engines).
  */
object Relational3 {

  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))
  private val oneD = lit(1).cast(DecimalType(12, 2))
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val q84 = Q(
    "q84_datetime_funcs",
    """SELECT o_orderkey,
      |  CAST(o_orderdate AS DATE) + 7 AS ship_by,
      |  CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since_epoch_start,
      |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
      |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      |  CAST(quarter(o_orderdate) AS INT) AS q,
      |  CAST(epoch(o_orderdate + INTERVAL 90 MINUTE) AS BIGINT) AS plus_90m_epoch
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    t(s, dir, "orders").select(
      col("o_orderkey"),
      date_add(col("o_orderdate").cast("date"), 7).as("ship_by"),
      datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
        .cast("int").as("days_since_epoch_start"),
      last_day(col("o_orderdate").cast("date")).as("month_end"),
      trunc(col("o_orderdate").cast("date"), "MM").as("month_start"),
      quarter(col("o_orderdate")).cast("int").as("q"),
      unix_timestamp(col("o_orderdate") + expr("INTERVAL 90 MINUTE"))
        .as("plus_90m_epoch"))
      .orderBy("o_orderkey")
  }

  private val q85 = Q(
    "q85_string_funcs",
    """SELECT p_partkey,
      |  lpad(p_brand, 12, '*') AS brand_pad,
      |  rpad(p_type, 10, '.') AS type_pad,
      |  reverse(p_name) AS name_rev,
      |  repeat(p_brand[7:7], 3) AS brand_digit3,
      |  split_part(p_name, ' ', 2) AS name_word2,
      |  translate(p_type, 'AEIOU', 'aeiou') AS type_lowered_vowels,
      |  starts_with(p_name, 'small') AS is_small,
      |  ends_with(p_name, 'bolt') AS is_bolt,
      |  CAST(levenshtein(p_brand, 'Brand#00') AS INT) AS lev_to_zero
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    t(s, dir, "part").select(
      col("p_partkey"),
      lpad(col("p_brand"), 12, "*").as("brand_pad"),
      rpad(col("p_type"), 10, ".").as("type_pad"),
      reverse(col("p_name")).as("name_rev"),
      repeat(substring(col("p_brand"), 7, 1), 3).as("brand_digit3"),
      split_part(col("p_name"), lit(" "), lit(2)).as("name_word2"),
      translate(col("p_type"), "AEIOU", "aeiou").as("type_lowered_vowels"),
      col("p_name").startsWith("small").as("is_small"),
      col("p_name").endsWith("bolt").as("is_bolt"),
      levenshtein(col("p_brand"), lit("Brand#00")).cast("int").as("lev_to_zero"))
      .orderBy("p_partkey")
  }

  private val q86 = Q(
    "q86_math_funcs",
    """SELECT o_orderkey,
      |  abs(o_totalprice - 100000) AS dist_from_100k,
      |  CAST(ceil(o_totalprice / 1000) AS BIGINT) AS price_ceil_k,
      |  CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_floor_k,
      |  sqrt(abs(o_totalprice)) AS price_sqrt,
      |  CAST(sign(o_totalprice - 150000) AS INT) AS above_150k,
      |  o_orderkey % 7 AS mod7,
      |  CAST(o_orderkey & 255 AS BIGINT) AS low_byte,
      |  CAST(xor(o_orderkey, 42) AS BIGINT) AS xored,
      |  CAST((o_orderkey << 2) >> 1 AS BIGINT) AS shifted,
      |  greatest(o_totalprice, 50000.0) AS at_least_50k
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    t(s, dir, "orders").select(
      col("o_orderkey"),
      abs(col("o_totalprice") - 100000).as("dist_from_100k"),
      ceil(col("o_totalprice") / 1000).cast("long").as("price_ceil_k"),
      floor(col("o_totalprice") / 1000).cast("long").as("price_floor_k"),
      // abs first: negative prices (refund rows in the adversarial
      // corpus) make sqrt NaN on Spark but an ERROR on DuckDB — there
      // is no oracle-expressible answer for a bare sqrt(negative)
      sqrt(abs(col("o_totalprice"))).as("price_sqrt"),
      signum(col("o_totalprice") - 150000).cast("int").as("above_150k"),
      (col("o_orderkey") % 7).as("mod7"),
      col("o_orderkey").bitwiseAND(255).cast("long").as("low_byte"),
      col("o_orderkey").bitwiseXOR(42).cast("long").as("xored"),
      shiftright(shiftleft(col("o_orderkey"), 2), 1).cast("long").as("shifted"),
      greatest(col("o_totalprice"), lit(50000.0)).as("at_least_50k"))
      .orderBy("o_orderkey")
  }

  private val q87 = Q(
    "q87_conditional",
    """SELECT c_custkey,
      |  coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_or_other,
      |  CASE WHEN c_acctbal < 0 THEN 'debt'
      |       WHEN c_acctbal = 0 THEN 'zero' ELSE 'credit' END AS bal_class,
      |  least(c_acctbal, 5000.0) AS capped_bal,
      |  (c_acctbal > 0) AND (c_nationkey < 10) AS positive_low_nation,
      |  CAST(if(c_acctbal > 5000, 1, 0) AS INT) AS high_bal
      |FROM customer ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    t(s, dir, "customer").select(
      col("c_custkey"),
      coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("OTHER"))
        .as("seg_or_other"),
      when(col("c_acctbal") < 0, "debt")
        .when(col("c_acctbal") === 0, "zero")
        .otherwise("credit").as("bal_class"),
      least(col("c_acctbal"), lit(5000.0)).as("capped_bal"),
      (col("c_acctbal") > 0 && col("c_nationkey") < 10).as("positive_low_nation"),
      when(col("c_acctbal") > 5000, 1).otherwise(0).cast("int").as("high_bal"))
      .orderBy("c_custkey")
  }

  private val q88 = Q(
    "q88_array_funcs",
    """SELECT doc_id,
      |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
      |  CAST(list_position(string_split(text, ' '), 'the') AS INT) AS first_the,
      |  list_sort(string_split(text, ' '))[1] AS min_word,
      |  array_to_string(string_split(text, ' ')[1:3], '_') AS first3_joined,
      |  CAST(list_max(list_transform(string_split(text, ' '), w -> length(w))) AS INT) AS max_word_len
      |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val ws = split(col("text"), " ")
    t(s, dir, "documents").filter(col("doc_id") < 50).select(
      col("doc_id"),
      array_contains(ws, "spark").as("has_spark"),
      array_position(ws, "the").cast("int").as("first_the"),
      sort_array(ws).getItem(0).as("min_word"),
      concat_ws("_", slice(ws, 1, 3)).as("first3_joined"),
      array_max(transform(ws, w => length(w))).cast("int").as("max_word_len"))
      .orderBy("doc_id")
  }

  private val q89 = Q(
    "q89_local_supplier_volume",
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
    // TPC-H Q5 shape: 6-way join. Fact-fact (orders x lineitem) is the
    // only shuffle join; every dimension broadcasts.
    val cust = t(s, dir, "customer")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = t(s, dir, "lineitem")
    val supp = t(s, dir, "supplier")
    val nat = t(s, dir, "nation")
    val reg = t(s, dir, "region").filter(col("r_name") === "ASIA")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey") &&
        cust("c_nationkey") === supp("s_nationkey"))
      .join(broadcast(nat), supp("s_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(dec(col("l_extendedprice")) * (oneD - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q90 = Q(
    "q90_returned_items",
    """SELECT c_custkey, c_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
      |  n_name
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate <  TIMESTAMP '1996-07-01'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, dir) =>
    // TPC-H Q10 shape: returned-item revenue ranking.
    val cust = t(s, dir, "customer")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
    val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
    val nat = t(s, dir, "nation")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(sum(dec(col("l_extendedprice")) * (oneD - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .select("c_custkey", "c_name", "revenue", "n_name")
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  private val q95 = Q(
    "q95_try_cast",
    """SELECT o_orderkey,
      |  TRY_CAST(o_orderpriority AS INT) AS prio_int,
      |  TRY_CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) AS prio_digit,
      |  TRY_CAST(o_orderstatus AS DOUBLE) AS status_num
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    t(s, dir, "orders").select(
      col("o_orderkey"),
      try_cast_int(col("o_orderpriority")).as("prio_int"),
      try_cast_int(substring(col("o_orderpriority"), 1, 1)).as("prio_digit"),
      expr("try_cast(o_orderstatus AS DOUBLE)").as("status_num"))
      .orderBy("o_orderkey")
  }

  private def try_cast_int(c: Column): Column = {
    import org.apache.spark.sql.functions.expr
    c.try_cast("int")
  }

  private val q97 = Q(
    "q97_percentiles",
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS med_qty,
      |  quantile_cont(l_extendedprice, 0.9) AS p90_price,
      |  quantile_disc(l_quantity, 0.25) AS q1_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    // Exact percentiles (sort-based; both engines use the same linear
    // interpolation on identical sorted inputs, so doubles match).
    t(s, dir, "lineitem").groupBy("l_returnflag")
      .agg(
        percentile(col("l_quantity"), lit(0.5)).as("med_qty"),
        percentile(col("l_extendedprice"), lit(0.9)).as("p90_price"),
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)").as("q1_qty"))
      .orderBy("l_returnflag")
  }

  private val q98 = sqlQ3(
    "q98_stratified_sample",
    """SELECT o_orderkey, o_orderstatus FROM orders
      |WHERE (o_orderkey * 2654435761) % 100 <
      |  CASE o_orderstatus WHEN 'P' THEN 50 WHEN 'F' THEN 10 ELSE 2 END
      |ORDER BY o_orderkey""".stripMargin)

  private def sqlQ3(name: String, text: String): Q =
    Q(name, text) { (s, dir) => Tables.registerAll(s, dir); s.sql(text) }

  // TPC-H Q17 shape: correlated scalar subquery (decorrelated by
  // Catalyst's RewriteCorrelatedScalarSubquery into a join).
  private val q100 = sqlQ3(
    "q100_small_quantity_orders",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#23'
      |  AND l_quantity < (
      |    SELECT 0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
      |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin)

  // TPC-H Q18 shape: IN over a grouped HAVING subquery.
  private val q101 = sqlQ3(
    "q101_large_volume_orders",
    """SELECT c_custkey, o_orderkey,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 110)
      |GROUP BY c_custkey, o_orderkey
      |ORDER BY total_qty DESC, o_orderkey LIMIT 50""".stripMargin)

  // TPC-H Q21 shape: correlated EXISTS + NOT EXISTS on the same table.
  private val q102 = sqlQ3(
    "q102_waiting_suppliers",
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate > l1.l_shipdate)
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)

  /** Recursive CTE (Spark 4's UnionLoopExec): ancestor closure with
    * distance over the implicit binary-tree hierarchy parent(k) = k/2 —
    * the SQL-surface twin of the lineage closure job
    * (graft.lineage.Closure), run natively by both engines. */
  private val q145 = Q(
    "q145_recursive_cte",
    """WITH RECURSIVE anc AS (
      |  SELECT o_orderkey AS c, o_orderkey // 2 AS p, CAST(1 AS BIGINT) AS dist
      |  FROM orders WHERE o_orderkey >= 2 AND o_orderkey < 2000
      |  UNION ALL
      |  SELECT c, p // 2, dist + 1 FROM anc WHERE p >= 2)
      |SELECT c, p AS anc, dist FROM anc ORDER BY c, dist""".stripMargin) {
    (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """WITH RECURSIVE anc AS (
          |  SELECT o_orderkey AS c, o_orderkey DIV 2 AS p, CAST(1 AS BIGINT) AS dist
          |  FROM orders WHERE o_orderkey >= 2 AND o_orderkey < 2000
          |  UNION ALL
          |  SELECT c, p DIV 2, dist + 1 FROM anc WHERE p >= 2)
          |SELECT c, p AS anc, dist FROM anc ORDER BY c, dist""".stripMargin)
  }

  /** Distribution window functions (§2.5 completion): NTILE buckets,
    * PERCENT_RANK, CUME_DIST. The window order carries a unique
    * tie-break (c_custkey) — NTILE assigns by row position, so without
    * it equal acctbals would bucket nondeterministically. All three are
    * rational arithmetic over ranks (no libm), hence hash-exact. */
  private val q149 = Q(
    "q149_window_distribution",
    """SELECT c_custkey, c_mktsegment,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT c_custkey, c_mktsegment,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** UNPIVOT (the inverse of q80's PIVOT): wide per-status counts back
    * to rows. NULL combinations are coalesced to 0 first — UNPIVOT
    * drops NULL cells by default on both engines, which would silently
    * change the row count. */
  private val q150 = Q(
    "q150_unpivot",
    """SELECT o_orderpriority, status, cnt FROM (
      |  SELECT o_orderpriority,
      |    coalesce(max(CASE WHEN o_orderstatus = 'F' THEN n END), 0) AS f,
      |    coalesce(max(CASE WHEN o_orderstatus = 'O' THEN n END), 0) AS o,
      |    coalesce(max(CASE WHEN o_orderstatus = 'P' THEN n END), 0) AS p
      |  FROM (SELECT o_orderpriority, o_orderstatus, count(*) AS n
      |        FROM orders GROUP BY 1, 2)
      |  GROUP BY o_orderpriority)
      |UNPIVOT (cnt FOR status IN (f, o, p))
      |ORDER BY o_orderpriority, status""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT o_orderpriority, status, cnt FROM (
        |  SELECT o_orderpriority,
        |    coalesce(max(CASE WHEN o_orderstatus = 'F' THEN n END), 0L) AS f,
        |    coalesce(max(CASE WHEN o_orderstatus = 'O' THEN n END), 0L) AS o,
        |    coalesce(max(CASE WHEN o_orderstatus = 'P' THEN n END), 0L) AS p
        |  FROM (SELECT o_orderpriority, o_orderstatus, count(*) AS n
        |        FROM orders GROUP BY 1, 2)
        |  GROUP BY o_orderpriority)
        |UNPIVOT (cnt FOR status IN (f, o, p))
        |ORDER BY o_orderpriority, status""".stripMargin)
  }

  /** Correlated LATERAL subquery join with per-row LIMIT (top-2
    * lineitems per order) — the lateral-subquery surface beyond
    * LATERAL VIEW explode (q31). Spark plans it as a rewritten
    * window/join, DuckDB executes it natively; results must agree. */
  private val q151 = Q(
    "q151_lateral_join",
    """SELECT o.o_orderkey, t.l_linenumber, t.l_extendedprice
      |FROM orders o JOIN LATERAL (
      |  SELECT l_linenumber, l_extendedprice FROM lineitem l
      |  WHERE l.l_orderkey = o.o_orderkey
      |  ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) t ON true
      |WHERE o.o_orderkey < 100
      |ORDER BY o_orderkey, l_extendedprice DESC, l_linenumber""".stripMargin) {
    (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT o.o_orderkey, t.l_linenumber, t.l_extendedprice
          |FROM orders o JOIN LATERAL (
          |  SELECT l_linenumber, l_extendedprice FROM lineitem l
          |  WHERE l.l_orderkey = o.o_orderkey
          |  ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) t
          |WHERE o.o_orderkey < 100
          |ORDER BY o_orderkey, l_extendedprice DESC, l_linenumber""".stripMargin)
  }

  /** The remaining Generator surface (§2.9 names explode/posexplode/
    * inline/json_tuple/stack; the first two are q31/q81): json_tuple
    * parses the props JSON as a UDTF, stack and inline pivot an
    * aggregate row into tall metric rows. The oracle recomputes with
    * regexp (the driver's DuckDB may lack the json extension) and a
    * plain UNION ALL. */
  private val q155 = Q(
    "q155_generators",
    """WITH agg AS (
      |  SELECT event_type, count(*) AS n_events,
      |    CAST(sum(CAST(regexp_extract(props, '([0-9]+)', 1) AS INT))
      |      AS BIGINT) AS sum_k
      |  FROM events GROUP BY 1)
      |SELECT event_type, metric, val FROM (
      |  SELECT event_type, 'n_events' AS metric, n_events AS val FROM agg
      |  UNION ALL
      |  SELECT event_type, 'sum_k', sum_k FROM agg
      |  UNION ALL
      |  SELECT event_type, 'double_n', n_events * 2 FROM agg)
      |ORDER BY event_type, metric""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """WITH jt AS (
        |  SELECT event_type, CAST(k AS BIGINT) AS k
        |  FROM events LATERAL VIEW json_tuple(props, 'k') j AS k),
        |agg AS (
        |  SELECT event_type, count(*) AS n_events, sum(k) AS sum_k
        |  FROM jt GROUP BY 1)
        |SELECT event_type, metric, val FROM (
        |  SELECT event_type, metric, val
        |  FROM agg
        |  LATERAL VIEW stack(2, 'n_events', n_events, 'sum_k', sum_k) s
        |    AS metric, val
        |  UNION ALL
        |  SELECT event_type, metric, val
        |  FROM agg
        |  LATERAL VIEW inline(array(
        |    named_struct('metric', 'double_n', 'val', n_events * 2L))) i)
        |ORDER BY event_type, metric""".stripMargin)
  }

  /** GROUPING__ID (§2.2's special-function list): the grouping bitmask
    * over a CUBE — Spark grouping_id() and DuckDB GROUPING() share
    * Postgres bit order (first argument most significant); the hash
    * compare pins that. */
  private val q156 = Q(
    "q156_grouping_id",
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
      |  count(*) AS n
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY gid, o_orderstatus ASC NULLS FIRST,
      |  o_orderpriority ASC NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  count(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST,
        |  o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  /** Map-typed column surface (the third complex type next to struct
    * q83 and array q88): build per-type day->count maps from entries,
    * merge disjoint maps with map_concat, rescale with
    * transform_values, and explode back to rows. The exploded, sorted
    * output makes map semantics oracle-checkable without a MAP type on
    * the oracle side. */
  private val q181 = Q(
    "q181_map_functions",
    """SELECT event_type, CAST(ts AS DATE) AS day,
      |  count(*) * 2 AS n2
      |FROM events GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin) { (s, dir) =>
    val daily = t(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    def toMap(df: DataFrame) = df
      .groupBy("event_type")
      .agg(map_from_entries(collect_list(struct(col("day"), col("n")))).as("m"))
    // split on even/odd day-of-month, merge the disjoint maps back
    val even = toMap(daily.filter(dayofmonth(col("day")) % 2 === 0))
    val odd = toMap(daily.filter(dayofmonth(col("day")) % 2 === 1))
    even.join(odd, Seq("event_type"), "full")
      .select(col("event_type"),
        map_concat(
          coalesce(even("m"), map_from_arrays(array(), array())),
          coalesce(odd("m"), map_from_arrays(array(), array()))).as("m"))
      .select(col("event_type"),
        explode(transform_values(col("m"), (_, v) => v * 2)))
      .withColumnRenamed("key", "day").withColumnRenamed("value", "n2")
      .orderBy("event_type", "day")
  }

  /** from_json with an explicit schema (vs q34's get_json_object path
    * and q155's json_tuple): schema-on-read parsing into a typed
    * struct, plus a to_json re-serialization roundtrip. The oracle
    * replays via regexp (the driver's DuckDB may not ship the json
    * extension — same contract as q34/q69). */
  private val q182 = Q(
    "q182_from_json_struct",
    """SELECT event_type, count(*) AS n_high,
      |  CAST(SUM(CAST(regexp_extract(props, '([0-9]+)', 1) AS INT)) AS BIGINT)
      |    AS sum_k
      |FROM events
      |WHERE CAST(regexp_extract(props, '([0-9]+)', 1) AS INT) > 50
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", IntegerType)))
    t(s, dir, "events")
      .withColumn("j", from_json(col("props"), schema))
      // to_json -> from_json roundtrip must preserve the parsed struct
      .withColumn("j2", from_json(to_json(col("j")), schema))
      .filter(col("j2.k") > 50)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_high"),
        sum(col("j2.k")).cast("long").as("sum_k"))
      .orderBy("event_type")
  }

  /** Join-strategy hints — the optimizer-control surface. The same
    * supplier-per-nation rollup is computed through a join that Spark
    * would broadcast by default (nation is 25 rows), but the
    * SHUFFLE_MERGE hint forces the sort-merge path; results must be
    * identical either way (hints steer the physical plan, never the
    * semantics — PlanAuditSpec pins that the hint was actually honored,
    * and q05's audit pins the unhinted broadcast default). The control
    * matters at 100 TB when the optimizer's size estimates are wrong:
    * a mis-broadcast OOMs every executor, and the hint is the
    * per-query override that doesn't touch global thresholds. */
  private val q200 = Q(
    "q200_join_hints",
    """SELECT n_name, count(*) AS n_suppliers,
      |  CAST(sum(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT /*+ SHUFFLE_MERGE(nation) */ n_name,
        |  count(*) AS n_suppliers,
        |  CAST(sum(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Presto `expr AT TIME ZONE 'tz'` (reference Bingql.g4:980-982
    * timezone_expr), EXECUTED through the preprocessor rewrite
    * ([[graft.lineage.SqlPreprocessor.rewriteAtTimeZone]]): the dialect
    * text becomes `from_utc_timestamp(expr, tz)` and runs on Spark. The
    * oracle replays the conversion with DuckDB's double-`timezone()`
    * form — timezone('UTC', ts) pins the naive timestamp to a UTC
    * instant, timezone(tz, …) renders the wall clock — which is
    * session-timezone independent on both ends. */
  private val q202 = Q(
    "q202_at_time_zone",
    """SELECT event_type,
      |  CAST(hour(timezone('America/Los_Angeles', timezone('UTC', ts))) AS INT)
      |    AS la_hour,
      |  count(*) AS n
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    val dialect =
      """SELECT event_type,
        |  CAST(hour(ts AT TIME ZONE 'America/Los_Angeles') AS INT) AS la_hour,
        |  count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    s.sql(graft.lineage.SqlPreprocessor.rewriteDialect(dialect))
  }

  val defs: Seq[Q] =
    Seq(q84, q85, q86, q87, q88, q89, q90, q95, q97, q98, q100, q101, q102,
      q145, q149, q150, q151, q155, q156, q181, q182, q200, q202)
}
