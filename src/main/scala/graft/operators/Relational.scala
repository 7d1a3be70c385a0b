package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Core relational operator inventory (SURVEY.md §2.1–2.8).
  *
  * Each entry is an idiomatic Spark DataFrame/Dataset implementation (or
  * `spark.sql` where the construct is SQL-surface, e.g. GROUPING SETS,
  * ordinal GROUP BY, LATERAL VIEW) paired with a DuckDB oracle.
  *
  * Scale notes (100 TB intent):
  *  - every query is a declarative plan: filters/projections reach the
  *    parquet scan via Catalyst pushdown; no driver-side loops;
  *  - aggregations are map-side partial by default (HashAggregateExec);
  *  - small-dimension joins (region/nation/supplier) broadcast;
  *  - monetary doubles are aggregated as DECIMAL so results are exact and
  *    order-independent — required both for distributed determinism and
  *    for the DuckDB hash-compare.
  */
object Relational {

  /** Exact decimal view of a 2-decimal monetary/quantity double. */
  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))
  private val oneD = lit(1).cast(DecimalType(12, 2))
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** A query whose Spark-SQL text and DuckDB oracle are the same ANSI SQL. */
  private def sqlQ(name: String, text: String): Q =
    Q(name, text) { (s, dir) => Tables.registerAll(s, dir); s.sql(text) }

  // ---------------------------------------------------------------- scans

  private val q02 = Q(
    "q02_scan_pushdown",
    """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
      |ORDER BY l_orderkey, l_linenumber LIMIT 500""".stripMargin) { (s, dir) =>
    // Filter + narrow projection: Catalyst pushes all four predicates and a
    // 4-column ReadSchema into the vectorized parquet scan.
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")
      .limit(500)
  }

  // ----------------------------------------------------------- aggregation

  private val q01 = Q(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS VARCHAR) AS sum_disc_price,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS VARCHAR) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    val li = t(s, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (oneD - dec(col("l_discount"))))
          .cast("string").as("sum_disc_price"),
        // Two scale-proofing steps, both learned from 10x-corpus drift:
        // (1) stage the 3-factor product — unstaged (12,2)*(13,2)*(13,2)
        // is precision 40 > 38 and the engines round the capped
        // intermediate differently; price*(1-disc) is (26,4) exact, cast
        // to (18,4) (no rounding — values fit), times (13,2) -> (32,6),
        // exact everywhere. (2) emit the exact decimal AS TEXT: past
        // ~2^53 in scaled units, decimal->double conversion itself is
        // engine-dependent (double rounding), and decimal->cents
        // rounding differs too (half-up vs half-even on .xx5 ties) —
        // the fixed-scale string is the one representation both engines
        // agree on at every magnitude.
        sum((dec(col("l_extendedprice")) * (oneD - dec(col("l_discount"))))
            .cast(DecimalType(18, 4)) *
            (oneD + dec(col("l_tax"))))
          .cast("string").as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  private val q16 = Q(
    "q16_agg_having",
    """SELECT o_custkey, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spent
      |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
      |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("spent"))
      .filter(col("n_orders") >= 12) // HAVING = post-aggregation filter
      .orderBy("o_custkey")
  }

  private val q17 = Q(
    "q17_distinct",
    """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin) { (s, dir) =>
    t(s, dir, "orders").select("o_orderstatus", "o_orderpriority")
      .distinct().orderBy("o_orderstatus", "o_orderpriority")
  }

  private val q18 = Q(
    "q18_count_distinct",
    """SELECT l_returnflag, COUNT(*) AS n_rows,
      |  COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_suppkey) AS n_supps,
      |  COUNT(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem").groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy("l_returnflag")
  }

  // Variance/stddev via exact decimal sums + identical final double
  // arithmetic on both engines (order-independent, hash-stable).
  private val q19 = sqlQ(
    "q19_agg_stats",
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s1,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s2,
      |  (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
      |   - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
      |     * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
      |  / (COUNT(*) - 1) AS var_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)

  private val q13 = sqlQ(
    "q13_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
      |                        (o_orderstatus, o_orderpriority), ())
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)

  private val q14 = sqlQ(
    "q14_rollup",
    """SELECT r_name, n_name, COUNT(*) AS n_cust
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)

  private val q15 = sqlQ(
    "q15_cube",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)

  private val q33 = sqlQ(
    "q33_group_ordinal",
    """SELECT o_orderpriority, COUNT(*) AS n FROM orders
      |GROUP BY 1 ORDER BY 1""".stripMargin)

  // ----------------------------------------------------------------- joins

  private val q05 = Q(
    "q05_join_inner",
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    // customer is the small side at TPC-H ratios (10:1) — broadcast it so
    // the fact table never shuffles.
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
      .orderBy("c_mktsegment")
  }

  private val q06 = Q(
    "q06_join_left",
    """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
      |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS spent
      |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(dec(col("o_totalprice"))), lit(0).cast(DecimalType(12, 2)))
          .cast("double").as("spent"))
      .orderBy("c_custkey")
  }

  private val q07 = Q(
    "q07_join_semi",
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_orderstatus") === "O")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name").orderBy("c_custkey")
  }

  private val q08 = Q(
    "q08_join_anti",
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_orderstatus") === "P")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name").orderBy("c_custkey")
  }

  private val q09 = Q(
    "q09_join_full",
    """SELECT COALESCE(cu.nk, su.nk) AS nationkey,
      |       COALESCE(cu.n_cust, 0) AS n_cust, COALESCE(su.n_supp, 0) AS n_supp
      |FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1) cu
      |FULL JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) su
      |  ON cu.nk = su.nk
      |ORDER BY nationkey""".stripMargin) { (s, dir) =>
    val cu = t(s, dir, "customer").groupBy(col("c_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_cust"))
    val su = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_supp"))
    cu.join(su, cu("nk") === su("nk"), "full")
      .select(coalesce(cu("nk"), su("nk")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy("nationkey")
  }

  private val q10 = Q(
    "q10_join_cross",
    """SELECT r_name, n_name FROM region CROSS JOIN nation
      |ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
    t(s, dir, "region").crossJoin(t(s, dir, "nation"))
      .select("r_name", "n_name").orderBy("r_name", "n_name")
  }

  private val q11 = Q(
    "q11_join_theta",
    """SELECT p_brand, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |  AND l_quantity BETWEEN p_size - 5 AND p_size + 5
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, dir) =>
    val li = t(s, dir, "lineitem")
    val p = t(s, dir, "part")
    // Equi key + range residual: hash join on the key, residual filtered.
    li.join(broadcast(p), li("l_partkey") === p("p_partkey") &&
        li("l_quantity").between(p("p_size") - 5, p("p_size") + 5))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_extendedprice"))).cast("double").as("revenue"))
      .orderBy("p_brand")
  }

  private val q12 = Q(
    "q12_join_multi",
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
      |  CAST(o_orderdate AS DATE) AS orderdate
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate  > TIMESTAMP '1998-01-01'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 20""".stripMargin) { (s, dir) =>
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(dec(col("l_extendedprice")) * (oneD - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        col("o_orderdate").cast("date").as("orderdate"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(20)
  }

  // -------------------------------------------------------------- windows

  private val q20 = Q(
    "q20_window_rank",
    """SELECT c_custkey, c_nationkey,
      |  CAST(RANK()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rnk,
      |  CAST(DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS INT) AS drnk,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rn
      |FROM customer ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"),
        row_number().over(w).as("rn"))
      .orderBy("c_custkey")
  }

  private val q21 = Q(
    "q21_window_lag_lead",
    """SELECT o_orderkey, o_custkey,
      |  LAG(o_totalprice)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey) AS prev_price,
      |  LEAD(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey) AS next_price,
      |  LAG(o_totalprice, 2, -1.0) OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey) AS prev2_price
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        lag(col("o_totalprice"), 2, -1.0).over(w).as("prev2_price"))
      .orderBy("o_orderkey")
  }

  private val q22 = Q(
    "q22_window_running",
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER (
      |    PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
      |FROM lineitem WHERE l_suppkey <= 20
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("l_suppkey")
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "lineitem").filter(col("l_suppkey") <= 20)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        sum(dec(col("l_quantity"))).over(w).cast("double").as("running_qty"))
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
  }

  private val q23 = Q(
    "q23_window_range_frame",
    """SELECT p_partkey, p_size,
      |  COUNT(*) OVER (ORDER BY p_size RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS n_near,
      |  CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) OVER (
      |    ORDER BY p_size RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS price_near
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    val w = Window.orderBy("p_size").rangeBetween(-2, Window.currentRow)
    t(s, dir, "part")
      .select(col("p_partkey"), col("p_size"),
        count(lit(1)).over(w).as("n_near"),
        sum(dec(col("p_retailprice"))).over(w).cast("double").as("price_near"))
      .orderBy("p_partkey")
  }

  private val q24 = Q(
    "q24_window_first_last",
    """SELECT o_orderkey, o_custkey,
      |  FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_ord,
      |  LAST_VALUE(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ord,
      |  NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_ord
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        first(col("o_orderkey")).over(w).as("first_ord"),
        last(col("o_orderkey")).over(w).as("last_ord"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_ord"))
      .orderBy("o_orderkey")
  }

  private val q25 = Q(
    "q25_topk_per_group",
    """SELECT o_custkey, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) x WHERE rn <= 3
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    // QUALIFY-style top-k per group: window + filter + drop (SURVEY §2.5).
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "o_orderkey")
  }

  // -------------------------------------------------------- sort / limit

  private val q26 = Q(
    "q26_order_limit",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin) { (s, dir) =>
    // Global top-n: Spark plans TakeOrderedAndProject (no full sort).
    t(s, dir, "orders").select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(50)
  }

  // ----------------------------------------------------------- set ops

  private val q27 = Q(
    "q27_union_all",
    """SELECT 'supp' AS src, s_name AS name FROM supplier
      |UNION ALL SELECT 'cust' AS src, c_name AS name FROM customer WHERE c_custkey <= 50
      |UNION ALL SELECT 'nation' AS src, n_name AS name FROM nation
      |ORDER BY src, name""".stripMargin) { (s, dir) =>
    val su = t(s, dir, "supplier").select(lit("supp").as("src"), col("s_name").as("name"))
    val cu = t(s, dir, "customer").filter(col("c_custkey") <= 50)
      .select(lit("cust").as("src"), col("c_name").as("name"))
    val na = t(s, dir, "nation").select(lit("nation").as("src"), col("n_name").as("name"))
    su.unionAll(cu).unionAll(na).orderBy("src", "name")
  }

  private val q28 = Q(
    "q28_union_distinct",
    """SELECT c_nationkey AS nk FROM customer
      |UNION SELECT s_nationkey AS nk FROM supplier ORDER BY nk""".stripMargin) { (s, dir) =>
    t(s, dir, "customer").select(col("c_nationkey").as("nk"))
      .union(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
      .distinct().orderBy("nk")
  }

  private val q29 = Q(
    "q29_except",
    """SELECT DISTINCT p_size AS k FROM part
      |EXCEPT SELECT n_nationkey AS k FROM nation ORDER BY k""".stripMargin) { (s, dir) =>
    t(s, dir, "part").select(col("p_size").as("k")).distinct()
      .except(t(s, dir, "nation").select(col("n_nationkey").as("k")))
      .orderBy("k")
  }

  private val q30 = Q(
    "q30_intersect",
    """SELECT c_nationkey AS nk FROM customer
      |INTERSECT SELECT s_nationkey AS nk FROM supplier ORDER BY nk""".stripMargin) { (s, dir) =>
    t(s, dir, "customer").select(col("c_nationkey").as("nk"))
      .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
      .orderBy("nk")
  }

  // --------------------------------------------- scalar exprs / predicates

  private val q03 = Q(
    "q03_expr_scalar",
    """SELECT o_orderkey,
      |  CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
      |  CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS o_month,
      |  CASE WHEN o_orderstatus = 'F' THEN 'finished'
      |       WHEN o_orderstatus = 'O' THEN 'open' ELSE 'other' END AS status_word,
      |  SUBSTRING(o_orderpriority, 1, 1) AS prio_code,
      |  TRIM(UPPER(SUBSTRING(o_orderpriority, 3, 20))) AS prio_word,
      |  CAST(POSITION('URGENT' IN o_orderpriority) AS INT) AS pos_urgent,
      |  o_orderstatus || '/' || SUBSTRING(o_orderpriority, 1, 1) AS status_prio,
      |  CASE WHEN o_totalprice < 50000 THEN 'low'
      |       WHEN o_totalprice < 150000 THEN 'mid' ELSE 'high' END AS price_band,
      |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS total_cents
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    t(s, dir, "orders").select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("int").as("o_year"),
      month(col("o_orderdate")).cast("int").as("o_month"),
      when(col("o_orderstatus") === "F", "finished")
        .when(col("o_orderstatus") === "O", "open")
        .otherwise("other").as("status_word"),
      substring(col("o_orderpriority"), 1, 1).as("prio_code"),
      trim(upper(substring(col("o_orderpriority"), 3, 20))).as("prio_word"),
      instr(col("o_orderpriority"), "URGENT").cast("int").as("pos_urgent"),
      concat(col("o_orderstatus"), lit("/"),
        substring(col("o_orderpriority"), 1, 1)).as("status_prio"),
      when(col("o_totalprice") < 50000, "low")
        .when(col("o_totalprice") < 150000, "mid")
        .otherwise("high").as("price_band"),
      (dec(col("o_totalprice")) * 100).cast("long").as("total_cents"))
      .orderBy("o_orderkey")
  }

  private val q04 = Q(
    "q04_predicates",
    """SELECT p_partkey, p_name, p_brand, p_type, p_size
      |FROM part
      |WHERE p_size BETWEEN 10 AND 40
      |  AND p_type IN ('ECONOMY', 'PROMO', 'STANDARD')
      |  AND p_name LIKE '%bolt%'
      |  AND p_brand NOT LIKE 'Brand#1%'
      |  AND p_retailprice IS NOT NULL
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    t(s, dir, "part")
      .filter(col("p_size").between(10, 40) &&
        col("p_type").isin("ECONOMY", "PROMO", "STANDARD") &&
        col("p_name").like("%bolt%") &&
        !col("p_brand").like("Brand#1%") &&
        col("p_retailprice").isNotNull)
      .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
      .orderBy("p_partkey")
  }

  // ------------------------------------------------------------ subqueries

  private val q37 = sqlQ(
    "q37_in_subquery",
    """SELECT o_orderkey, o_custkey FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
      |  AND o_orderstatus = 'O'
      |ORDER BY o_orderkey""".stripMargin)

  private val q38 = sqlQ(
    "q38_scalar_subquery",
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_totalprice > (
      |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) * 1.5
      |  FROM orders)
      |ORDER BY o_orderkey""".stripMargin)

  // ------------------------------------------------------------------ CTE

  private val q32 = sqlQ(
    "q32_cte",
    """WITH cust_orders AS (
      |  SELECT o_custkey, COUNT(*) AS n_orders,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spent
      |  FROM orders GROUP BY o_custkey),
      |big AS (SELECT * FROM cust_orders WHERE n_orders >= 8)
      |SELECT c_custkey, c_name, n_orders, spent
      |FROM big JOIN customer ON c_custkey = o_custkey
      |ORDER BY spent DESC, c_custkey LIMIT 100""".stripMargin)

  // ------------------------------------------------- lateral view / UDTF

  private val q31 = Q(
    "q31_lateral_explode",
    """SELECT word, COUNT(*) AS n FROM (
      |  SELECT unnest(string_split(text, ' ')) AS word
      |  FROM documents WHERE doc_id < 100) w
      |WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    // LATERAL VIEW explode = Generate(Explode(...)) (SURVEY §2.9).
    s.sql(
      """SELECT word, COUNT(*) AS n
        |FROM documents LATERAL VIEW explode(split(text, ' ')) w AS word
        |WHERE doc_id < 100 AND word <> ''
        |GROUP BY word ORDER BY word""".stripMargin)
  }

  // ---------------------------------------------------------- events / json

  private val q34 = Q(
    "q34_json_extract",
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(regexp_extract(props, '([0-9]+)', 1) AS INT)) AS BIGINT) AS sum_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    // Real impl uses the JSON path; oracle uses an equivalent regexp (the
    // driver's DuckDB may not ship the json extension).
    t(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).cast("long").as("sum_k"))
      .orderBy("event_type")
  }

  private val q35 = Q(
    "q35_events_daily",
    """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .orderBy("day", "event_type")
  }

  val defs: Seq[Q] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12,
    q13, q14, q15, q16, q17, q18, q19, q20, q21, q22, q23, q24,
    q25, q26, q27, q28, q29, q30, q31, q32, q33, q34, q35, q37, q38)
}
