package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second relational batch: inline VALUES tables, set-op ALL variants,
  * named windows, deterministic hash sampling, multi-insert EXECUTION,
  * views, union-by-name, pivot, posexplode, struct ops, higher-order
  * functions (SURVEY §2.2/2.7/2.8/2.9).
  */
object Relational2 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def sqlQ(name: String, text: String): Q =
    Q(name, text) { (s, dir) => Tables.registerAll(s, dir); s.sql(text) }

  private val q72 = sqlQ(
    "q72_values_inline",
    """SELECT n_name, tag FROM (VALUES (0, 'zero'), (1, 'one'), (2, 'two')) AS t(nk, tag)
      |JOIN nation ON n_nationkey = nk ORDER BY n_name""".stripMargin)

  private val q73 = Q(
    "q73_except_all",
    """SELECT c_nationkey AS nk FROM customer
      |EXCEPT ALL SELECT s_nationkey AS nk FROM supplier ORDER BY nk""".stripMargin) { (s, dir) =>
    t(s, dir, "customer").select(col("c_nationkey").as("nk"))
      .exceptAll(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
      .orderBy("nk")
  }

  private val q74 = Q(
    "q74_intersect_all",
    """SELECT c_nationkey AS nk FROM customer
      |INTERSECT ALL SELECT n_nationkey AS nk FROM nation ORDER BY nk""".stripMargin) { (s, dir) =>
    t(s, dir, "customer").select(col("c_nationkey").as("nk"))
      .intersectAll(t(s, dir, "nation").select(col("n_nationkey").as("nk")))
      .orderBy("nk")
  }

  private val q75 = sqlQ(
    "q75_named_window",
    """SELECT o_orderkey,
      |  CAST(RANK() OVER w AS INT) AS rnk,
      |  LAG(o_orderkey) OVER w AS prev_key
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin)

  // Deterministic hash sampling — the scalable, cross-engine alternative
  // to TABLESAMPLE (whose RNG differs per engine): a multiplicative hash
  // on the key selects a stable ~10% slice on any engine at any scale.
  private val q76 = sqlQ(
    "q76_hash_sample",
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      |WHERE (l_orderkey * 2654435761) % 100 < 10
      |ORDER BY l_orderkey, l_linenumber""".stripMargin)

  private val q77 = Q(
    "q77_multi_insert_exec",
    """SELECT 'hi' AS bucket, o_orderkey, o_totalprice FROM orders WHERE o_totalprice >= 300000
      |UNION ALL
      |SELECT 'lo' AS bucket, o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 2000
      |ORDER BY bucket, o_orderkey""".stripMargin) { (s, dir) =>
    // EXECUTE the Hive multi-table INSERT surface (SURVEY §2.8): one scan
    // fans out into two targets, then read both back. INSERT OVERWRITE
    // keeps the query idempotent.
    Tables.registerAll(s, dir)
    s.sql("CREATE DATABASE IF NOT EXISTS graft_exec LOCATION 'file:///tmp/graft_exec_db'")
    Seq("hi_orders", "lo_orders").foreach { tbl =>
      s.sql(s"CREATE TABLE IF NOT EXISTS graft_exec.$tbl " +
        s"(o_orderkey BIGINT, o_totalprice DOUBLE) USING parquet " +
        s"LOCATION 'file:///tmp/graft_exec_db/$tbl'")
    }
    s.sql(
      """FROM orders
        |INSERT OVERWRITE TABLE graft_exec.hi_orders
        |  SELECT o_orderkey, o_totalprice WHERE o_totalprice >= 300000
        |INSERT OVERWRITE TABLE graft_exec.lo_orders
        |  SELECT o_orderkey, o_totalprice WHERE o_totalprice < 2000""".stripMargin)
    s.table("graft_exec.hi_orders").select(lit("hi").as("bucket"), col("o_orderkey"), col("o_totalprice"))
      .unionAll(s.table("graft_exec.lo_orders")
        .select(lit("lo").as("bucket"), col("o_orderkey"), col("o_totalprice")))
      .orderBy("bucket", "o_orderkey")
  }

  private val q78 = Q(
    "q78_view",
    """SELECT c_mktsegment, n_orders, spent FROM (
      |  SELECT c_mktsegment, COUNT(*) AS n_orders,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spent
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY c_mktsegment) v
      |WHERE n_orders > 100 ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
    // CREATE VIEW + query-through-view (the reference parses but ignores
    // views — SURVEY §2.8 flags that as a gap we close).
    Tables.registerAll(s, dir)
    s.sql(
      """CREATE OR REPLACE TEMPORARY VIEW graft_seg_view AS
        |SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spent
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin)
    s.sql("SELECT c_mktsegment, n_orders, spent FROM graft_seg_view " +
      "WHERE n_orders > 100 ORDER BY c_mktsegment")
  }

  private val q79 = Q(
    "q79_union_by_name",
    """SELECT * FROM (
      |  SELECT n_nationkey AS nk, n_name AS name, NULL AS region FROM nation
      |  UNION ALL
      |  SELECT r_regionkey AS nk, r_name AS name, r_name AS region FROM region)
      |ORDER BY nk, name""".stripMargin) { (s, dir) =>
    val a = t(s, dir, "nation")
      .select(col("n_nationkey").as("nk"), col("n_name").as("name"))
    val b = t(s, dir, "region")
      .select(col("r_name").as("region"), col("r_name").as("name"),
        col("r_regionkey").as("nk")) // different column ORDER + extra col
    a.unionByName(b, allowMissingColumns = true)
      .select(col("nk"), col("name"), col("region").cast("string"))
      .orderBy("nk", "name")
  }

  private val q80 = Q(
    "q80_pivot",
    """SELECT o_orderpriority,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("F"),
        coalesce(col("O"), lit(0L)).as("O"),
        coalesce(col("P"), lit(0L)).as("P"))
      .orderBy("o_orderpriority")
  }

  private val q81 = Q(
    "q81_posexplode",
    """SELECT doc_id, unnest(range(0, len(ws))) AS pos, unnest(ws) AS word
      |FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      |WHERE doc_id < 20 ORDER BY doc_id, pos""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT doc_id, CAST(pos AS BIGINT) AS pos, word
        |FROM documents
        |LATERAL VIEW posexplode(split(text, ' ')) t AS pos, word
        |WHERE doc_id < 20 ORDER BY doc_id, pos""".stripMargin)
  }

  private val q82 = Q(
    "q82_higher_order",
    """SELECT doc_id,
      |  CAST(list_sum(list_transform(string_split(text, ' '), w -> length(w))) AS BIGINT) AS sum_word_len,
      |  len(list_filter(string_split(text, ' '), w -> length(w) > 5)) AS n_long_words,
      |  len(list_filter(string_split(text, ' '), w -> w = 'spark')) > 0 AS has_spark
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    t(s, dir, "documents").select(
      col("doc_id"),
      expr("aggregate(transform(split(text, ' '), w -> length(w)), 0, (a, x) -> a + x)")
        .cast("long").as("sum_word_len"),
      size(expr("filter(split(text, ' '), w -> length(w) > 5)")).cast("long")
        .as("n_long_words"),
      expr("exists(split(text, ' '), w -> w = 'spark')").as("has_spark"))
      .orderBy("doc_id")
  }

  private val q83 = Q(
    "q83_struct_ops",
    """SELECT o_orderkey,
      |  struct_pack(k := o_orderkey, p := o_totalprice).p AS packed_price,
      |  [o_orderkey, o_custkey][1] AS first_elem,
      |  len([o_orderkey, o_custkey]) AS arr_len
      |FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    t(s, dir, "orders").filter(col("o_orderkey") <= 100).select(
      col("o_orderkey"),
      struct(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
        .getField("p").as("packed_price"),
      expr("array(o_orderkey, o_custkey)[0]").as("first_elem"),
      size(array(col("o_orderkey"), col("o_custkey"))).cast("long").as("arr_len"))
      .orderBy("o_orderkey")
  }

  /** DISTRIBUTE BY + SORT BY (reference distribute_clause,
    * Bingql.g4:700-703): hash-repartition by key, partition-local sort —
    * the write-side clustering pattern (co-locate without a global sort).
    * At 100 TB this is the cheap way to bucket output for downstream
    * co-located joins: one shuffle, no range-partition sampling pass.
    * The trailing total ORDER BY exists only for the deterministic
    * cross-engine compare. */
  private val q110 = Q(
    "q110_distribute_sort_by",
    """SELECT l_orderkey AS ok, l_linenumber AS ln, l_quantity AS qty
      |FROM lineitem WHERE l_orderkey < 200 ORDER BY ok, ln, qty""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT l_orderkey AS ok, l_linenumber AS ln, l_quantity AS qty
        |FROM lineitem WHERE l_orderkey < 200
        |DISTRIBUTE BY l_orderkey SORT BY l_orderkey, l_linenumber""".stripMargin)
      .orderBy("ok", "ln", "qty")
  }

  /** CLUSTER BY = DISTRIBUTE BY + SORT BY on the same keys
    * (Bingql.g4:700-703). */
  private val q111 = Q(
    "q111_cluster_by",
    """SELECT s_nationkey AS nk, s_suppkey AS sk FROM supplier
      |ORDER BY nk, sk""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT s_nationkey AS nk, s_suppkey AS sk FROM supplier
        |CLUSTER BY s_nationkey""".stripMargin)
      .orderBy("nk", "sk")
  }

  /** Native TABLESAMPLE (reference Bingql.g4:1023-1033). The sampled
    * row SET is engine-RNG-specific (q76's deterministic hash sample is
    * the row-exact verified equivalent), so this query verifies the
    * sample's PROPERTIES instead, all computed in-Spark from the actual
    * sample and emitted as booleans the oracle can state: the rate lands
    * inside 0.10*n +/- (0.03*n + 6*sqrt(0.10*n)) (>6 sigma for Bernoulli
    * at any table size), sampling is without replacement (per-key sample
    * multiplicity never exceeds the base table's — (orderkey, linenumber)
    * is NOT unique in this corpus, so the check compares counts, not
    * distinctness), and every sampled row exists in the base table.
    * REPEATABLE(42) run-to-run stability is pinned in
    * OperatorsSpec2. At scale TABLESAMPLE pushes into the scan
    * (per-partition Bernoulli sampling, no shuffle — the property
    * aggregation here is test scaffolding, not the operator). */
  private val q121 = Q(
    "q121_tablesample",
    """SELECT true AS rate_in_bounds, true AS without_replacement,
      |       true AS subset_of_base""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """WITH samp AS (
        |  SELECT l_orderkey AS ok, l_linenumber AS ln FROM lineitem
        |  TABLESAMPLE (10 PERCENT) REPEATABLE (42)
        |),
        |base AS (SELECT CAST(count(*) AS DOUBLE) AS n_base FROM lineitem),
        |agg AS (SELECT count(*) AS n_samp FROM samp),
        |samp_cnt AS (SELECT ok, ln, count(*) AS c FROM samp GROUP BY ok, ln),
        |base_cnt AS (
        |  SELECT l_orderkey AS ok, l_linenumber AS ln, count(*) AS c
        |  FROM lineitem GROUP BY l_orderkey, l_linenumber
        |),
        |viol AS (
        |  SELECT
        |    count_if(b.c IS NULL) AS n_foreign,
        |    count_if(b.c IS NOT NULL AND s.c > b.c) AS n_over
        |  FROM samp_cnt s LEFT JOIN base_cnt b ON s.ok = b.ok AND s.ln = b.ln
        |)
        |SELECT
        |  abs(n_samp - 0.10 * n_base) <= 0.03 * n_base + 6.0 * sqrt(0.10 * n_base)
        |    AS rate_in_bounds,
        |  n_over = 0 AS without_replacement,
        |  n_foreign = 0 AS subset_of_base
        |FROM agg, base, viol""".stripMargin)
  }

  /** Observed metrics (`df.observe`): accumulator-style aggregates
    * collected DURING the main pass — at 100 TB the row-count /
    * total-value audit metrics a pipeline must log would otherwise cost
    * a second full scan. The observed values are emitted as the result
    * (via the query-execution listener payload), so the oracle verifies
    * the metrics themselves. */
  private val q158 = Q(
    "q158_observe_metrics",
    """SELECT count(*) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty,
      |  min(l_orderkey) AS min_key, max(l_orderkey) AS max_key
      |FROM lineitem WHERE l_discount > 0.05""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.Observation
    val obs = Observation("graft_audit")
    val main = Tables.load(s, dir, "lineitem")
      .filter(col("l_discount") > 0.05)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double")
          .as("total_qty"),
        min("l_orderkey").as("min_key"), max("l_orderkey").as("max_key"))
    // drive the pass (a real pipeline would write here); the metrics
    // piggyback on it — no second scan
    main.write.mode("overwrite")
      .parquet(s"/tmp/graft_observe_${math.abs(dir.hashCode)}")
    val row = obs.get
    import s.implicits._
    Seq((row("n_rows").asInstanceOf[Long],
      row("total_qty").asInstanceOf[Double],
      row("min_key").asInstanceOf[Long],
      row("max_key").asInstanceOf[Long]))
      .toDF("n_rows", "total_qty", "min_key", "max_key")
  }

  /** The explicit UDF-registration surface (§2.9: the reference accepts
    * any `ident(args)` as a function). A Scala UDF is the SLOW path —
    * no codegen, boxing per row — kept off hot paths; this query pins
    * the registration/behavior surface itself against a pure-SQL oracle. */
  private val q159 = Q(
    "q159_udf_surface",
    """SELECT s_nationkey,
      |  count(*) FILTER (WHERE length(s_name) % 2 = 0) AS n_even,
      |  count(*) AS n
      |FROM supplier GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    s.udf.register("graft_even_len", (name: String) => name.length % 2 == 0)
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT s_nationkey,
        |  count(*) FILTER (WHERE graft_even_len(s_name)) AS n_even,
        |  count(*) AS n
        |FROM supplier GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  val defs: Seq[Q] = Seq(q72, q73, q74, q75, q76, q77, q78, q79, q80, q81,
    q82, q83, q110, q111, q121, q158, q159)
}
