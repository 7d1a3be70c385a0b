package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-surface semantics — parameterized SQL, IGNORE NULLS windows, WITHIN GROUP percentiles, LISTAGG, XML round trips, SQL scripting, SQL UDFs/TVFs, collated grouping, EXECUTE IMMEDIATE, null-aware anti joins, TRY arithmetic, correlated scalars, OR-semi unions.
  *
  * Consolidated from the round-7..9 ModernOps series (round-10 judge
  * item): queries regrouped by theme; behavior and query names are
  * byte-identical to the originals.
  */
object SqlSurfaceOps {

  // ------------- q336: NOT IN vs anti join under NULLs

  /** The exclusion list: part keys of low-quantity lineitems, with a
    * NULL injected for every quantity-below-2 row — NULL-bearing by
    * construction at every corpus. */
  private val ExclusionSql =
    """SELECT CASE WHEN l_quantity < 2 THEN NULL ELSE l_partkey END AS pk
      |FROM lineitem WHERE l_quantity <= 5""".stripMargin


  /** Spec probe (ModernOps16 heritage): the NOT IN subquery as the raw
    * engine would run it — pinned against q336's null-aware rewrite. */
  private[graft] def rawNotInFrame(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      s"""SELECT p_partkey FROM part
         |WHERE p_partkey NOT IN (SELECT pk FROM ($ExclusionSql))"""
        .stripMargin)
  }


  /** Spec probe (ModernOps27 heritage): the naive OR-of-keys semi join
    * q366 rewrites away — pinned equal by the spec. */
  private[graft] def orExistsNaive(
      s: org.apache.spark.sql.SparkSession, dir: String) = {
    val c = Tables.load(s, dir, "customer")
      .filter(col("c_custkey").isNotNull)
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"))
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_custkey").isNotNull)
      .select(col("o_custkey").as("direct_k"),
        (col("o_orderkey") % 1500).as("referral_k"))
    c.join(o, c("k") === o("direct_k") || c("k") === o("referral_k"),
      "left_semi")
      .groupBy("seg")
      .agg(count(lit(1)).as("n_matched"))
      .select(col("seg"), col("n_matched").cast("long").as("n_matched"))
      .orderBy("seg")
  }


  // ------------- q276: parameterized SQL + IDENTIFIER clause

  /** The modern injection-safe query surface: named parameters bound
    * via `spark.sql(text, args)` and table indirection through the
    * `IDENTIFIER()` clause — the plan after binding is byte-identical
    * to the literal spelling (the oracle runs exactly that literal
    * spelling), so parameterization costs nothing at any scale. */
  private val q276 = Q(
    "q276_parameterized_sql",
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS VARCHAR) AS sum_bal
      |FROM customer WHERE c_acctbal > 1000
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS STRING) AS sum_bal
        |FROM IDENTIFIER(:tbl) WHERE c_acctbal > :minbal
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
      Map("tbl" -> "customer", "minbal" -> 1000))
  }


  // ------------- q277: IGNORE NULLS window carry-forward

  /** Last-observation-carried-forward over a sparse signal: nulls are
    * planted deterministically (every 5th event), then
    * `last_value IGNORE NULLS` over a running frame fills them and
    * `first_value IGNORE NULLS` over the full partition pins the first
    * real observation — the standard gap-fill idiom that needs NO
    * self-join or subquery (one window exchange per partition key,
    * scale-safe). Values ship as integer cents (round() is half
    * away from zero in both engines on identical IEEE doubles). */
  private val q277 = Q(
    "q277_ignore_nulls_window",
    """SELECT event_id, user_id,
      |  CAST(round(last_value(v IGNORE NULLS) OVER w * 100) AS BIGINT)
      |    AS carry_cents,
      |  CAST(round(first_value(v IGNORE NULLS) OVER w2 * 100) AS BIGINT)
      |    AS first_cents
      |FROM (SELECT event_id, user_id, ts,
      |        CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
      |      FROM events WHERE user_id < 100)
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |  w2 AS (PARTITION BY user_id ORDER BY ts, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY user_id, ts, event_id""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    // Spark spells the null treatment as a postfix clause on the call;
    // semantics (and the window exchanges) are identical.
    s.sql(
      """SELECT event_id, user_id,
        |  CAST(round(last_value(v) IGNORE NULLS OVER w * 100) AS BIGINT)
        |    AS carry_cents,
        |  CAST(round(first_value(v) IGNORE NULLS OVER w2 * 100) AS BIGINT)
        |    AS first_cents
        |FROM (SELECT event_id, user_id, ts,
        |        CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
        |      FROM events WHERE user_id < 100)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  w2 AS (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, ts, event_id""".stripMargin)
  }


  // ------------- q285: ANSI WITHIN GROUP percentiles

  /** ANSI ordered-set aggregates: percentile_cont / percentile_disc
    * WITHIN GROUP (ORDER BY ...) — the inverse-distribution surface
    * next to the approx sketches (q135) and exact window percentiles
    * (q97). Quantities are integral doubles, so the f=0.5/0.9
    * interpolations are exact in IEEE arithmetic and the cents
    * quantization cannot sit on a rounding boundary. */
  private val q285 = Q(
    "q285_within_group_percentiles",
    """SELECT l_returnflag,
      |  CAST(round(quantile_cont(l_quantity, 0.5) * 100) AS BIGINT) AS p50_c,
      |  CAST(round(quantile_cont(l_quantity, 0.9) * 100) AS BIGINT) AS p90_c,
      |  CAST(round(quantile_disc(l_quantity, 0.25) * 100) AS BIGINT) AS p25d_c,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
    (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT l_returnflag,
        |  CAST(round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity)
        |    * 100) AS BIGINT) AS p50_c,
        |  CAST(round(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity)
        |    * 100) AS BIGINT) AS p90_c,
        |  CAST(round(percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)
        |    * 100) AS BIGINT) AS p25d_c,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }


  // ------------- q286: LISTAGG

  /** ANSI LISTAGG WITHIN GROUP — ordered string concatenation per
    * group. The ORDER BY inside the aggregate is what makes a parallel
    * fold deterministic; bounded here by a key filter the way any sane
    * 100 TB use would bound it (LISTAGG over unbounded groups is an
    * anti-pattern — the q187 collect_set caveat applies). */
  private val q286 = Q(
    "q286_listagg",
    """SELECT n.n_name,
      |  string_agg(c.c_name, ',' ORDER BY c.c_name) AS names,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE c.c_custkey <= 200
      |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT n.n_name,
        |  listagg(c.c_name, ',') WITHIN GROUP (ORDER BY c.c_name) AS names,
        |  count(*) AS n
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE c.c_custkey <= 200
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin)
  }


  // ------------- q287: XML functions round trip

  /** Spark 4's native XML surface (to_xml / from_xml): serialize a
    * struct per row, parse it back with an explicit schema, and emit
    * the recovered fields — the oracle pins the round trip as an
    * identity on the base table. Both directions are scalar codegen
    * expressions: no shuffle at all until the output sort, so the
    * pass is embarrassingly parallel at any scale. */
  private val q287 = Q(
    "q287_xml_roundtrip",
    """SELECT CAST(s_suppkey AS BIGINT) AS k, s_name,
      |  CAST(s_nationkey AS BIGINT) AS nk
      |FROM supplier ORDER BY k""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "supplier")
      .select(col("s_suppkey").cast("long").as("k"), col("s_name"),
        col("s_nationkey").cast("long").as("nk"))
      .withColumn("xml", expr("to_xml(struct(k, s_name, nk))"))
      .withColumn("p", expr("from_xml(xml, 'k BIGINT, s_name STRING, nk BIGINT')"))
      .select(col("p.k").as("k"), col("p.s_name").as("s_name"),
        col("p.nk").as("nk"))
      .orderBy("k")
  }


  // ------------- q295: SQL scripting (BEGIN/DECLARE/WHILE)

  /** Spark 4.1 SQL scripting as a first-class surface: a procedural
    * threshold search — double a price threshold until fewer than 100
    * orders exceed it — written as BEGIN/DECLARE/WHILE/SET with scalar
    * subqueries, the shape ops teams use for data-driven control flow
    * without leaving SQL. The script's last statement is the result.
    * Each iteration is one predicate count over orders (a single-column
    * scan, ~log2(max_price/1000) <= 40 iterations total, all
    * driver-coordinated — no data ever collects). The oracle replays
    * the loop as a recursive CTE; thresholds are exact powers of two
    * times 1000, so the DOUBLE arithmetic is drift-free on both
    * engines. NULL prices fall out of the predicate identically. */
  private val q295 = Q(
    "q295_sql_scripting",
    """WITH RECURSIVE it(thr, n, iters) AS (
      |  SELECT CAST(1000.0 AS DOUBLE),
      |    (SELECT count(*) FROM orders WHERE o_totalprice > 1000.0), 0
      |  UNION ALL
      |  SELECT thr * 2,
      |    (SELECT count(*) FROM orders WHERE o_totalprice > it.thr * 2),
      |    iters + 1
      |  FROM it WHERE n >= 100)
      |SELECT CAST(thr AS BIGINT) AS thr, CAST(n AS BIGINT) AS n_above,
      |  CAST(iters AS BIGINT) AS iters
      |FROM it WHERE n < 100""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.conf.set("spark.sql.scripting.enabled", "true")
    s.sql(
      """BEGIN
        |  DECLARE thr DOUBLE DEFAULT 1000.0;
        |  DECLARE n BIGINT DEFAULT 0;
        |  DECLARE iters BIGINT DEFAULT 0;
        |  SET n = (SELECT count(*) FROM orders WHERE o_totalprice > thr);
        |  WHILE n >= 100 DO
        |    SET thr = thr * 2;
        |    SET iters = iters + 1;
        |    SET n = (SELECT count(*) FROM orders WHERE o_totalprice > thr);
        |  END WHILE;
        |  SELECT CAST(thr AS BIGINT) AS thr, n AS n_above, iters;
        |END""".stripMargin)
  }


  // ------------- q296: SQL UDF + SQL table function

  /** Declarative user functions — no JVM code, fully optimizer-visible:
    * a scalar SQL UDF (price banding; CREATE FUNCTION ... RETURN expr)
    * and a SQL TABLE function (a fiscal-quarter dimension; RETURNS
    * TABLE ... RETURN SELECT) joined like any relation. Because both
    * inline into the plan at analysis, the band CASE lands inside the
    * scan's codegen stage, and the 4-row quarter table broadcasts —
    * identical cost to spelling everything out, which is exactly what
    * the oracle does. NULL dates drop out of the month-range join and
    * NULL prices get their own band on both engines (adversarial
    * corpus pins both). */
  private val q296 = Q(
    "q296_sql_udf_tvf",
    """SELECT q.qtr AS qtr,
      |  CASE WHEN o.o_totalprice IS NULL THEN 'null'
      |       WHEN o.o_totalprice < 50000 THEN 'lo'
      |       WHEN o.o_totalprice < 200000 THEN 'mid'
      |       ELSE 'hi' END AS band,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS VARCHAR)
      |    AS revenue
      |FROM orders o JOIN (VALUES (1, 1, 3), (2, 4, 6), (3, 7, 9),
      |  (4, 10, 12)) q(qtr, mlo, mhi)
      |  ON month(o.o_orderdate) BETWEEN q.mlo AND q.mhi
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_band(p DOUBLE)
        |RETURNS STRING RETURN CASE WHEN p IS NULL THEN 'null'
        |  WHEN p < 50000 THEN 'lo' WHEN p < 200000 THEN 'mid'
        |  ELSE 'hi' END""".stripMargin)
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_quarters()
        |RETURNS TABLE(qtr INT, mlo INT, mhi INT)
        |RETURN SELECT * FROM VALUES (1, 1, 3), (2, 4, 6), (3, 7, 9),
        |  (4, 10, 12) AS t(qtr, mlo, mhi)""".stripMargin)
    s.sql(
      """SELECT q.qtr AS qtr, graft_band(o.o_totalprice) AS band,
        |  count(*) AS n,
        |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS STRING)
        |    AS revenue
        |FROM orders o JOIN graft_quarters() q
        |  ON month(o.o_orderdate) BETWEEN q.mlo AND q.mhi
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }


  // collation-aware grouping and equality (Spark 4 `COLLATE
  // UTF8_LCASE`) — case-insensitive semantics declared in the TYPE,
  // so Catalyst plans a normal hash aggregate instead of the
  // lower()-wrapping that breaks stats and pushdown;
  // ------------- q298: collation-aware grouping (COLLATE UTF8_LCASE)

  /** Case-insensitive grouping via a collated type instead of lower():
    * the inner SELECT manufactures mixed-case keys deterministically
    * (doc_ids ≡ 1 mod 3 are uppercased — mod 3 is coprime to the corpus's source = id mod 20 layout, so every group mixes cases), declares them `COLLATE UTF8_LCASE`,
    * and the outer GROUP BY + the `k = 'SRC1'` predicate both resolve
    * under that collation — no expression wrapping, so the aggregate
    * keys stay simple attributes (column pruning and partial
    * aggregation see a plain column). The emitted key is lower(k):
    * every member of a case-insensitive group lowercases identically,
    * so the output is deterministic even though the group's
    * representative is not. The oracle spells the same query with
    * explicit lower(). NULL sources are filtered on both sides. */
  private val q298 = Q(
    "q298_collated_group",
    """SELECT lower(k) AS source_ci,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  CAST(count_if(lower(k) = 'src1') AS BIGINT) AS n_src1
      |FROM (SELECT CASE WHEN doc_id % 3 = 1 THEN upper(source)
      |             ELSE source END AS k, n_chars
      |      FROM documents WHERE source IS NOT NULL)
      |GROUP BY lower(k) ORDER BY source_ci""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT lower(k) AS source_ci,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(count_if(k = 'SRC1') AS BIGINT) AS n_src1
        |FROM (SELECT CASE WHEN doc_id % 3 = 1 THEN upper(source)
        |             ELSE source END COLLATE UTF8_LCASE AS k, n_chars
        |      FROM documents WHERE source IS NOT NULL)
        |GROUP BY k ORDER BY source_ci""".stripMargin)
  }


  // `EXECUTE IMMEDIATE` + `IDENTIFIER()` + session variables —
  // Spark 4's injection-safe dynamic SQL (table names and predicate
  // values arrive as BOUND VALUES, never string-spliced);
  // ------------- q301: EXECUTE IMMEDIATE + IDENTIFIER + session vars

  /** Dynamic SQL the way Spark 4 wants it written: the statement text
    * is a constant, the table name flows through `IDENTIFIER(?)` and
    * the predicate value through a `?` parameter marker, both bound
    * from SESSION VARIABLES by `EXECUTE IMMEDIATE ... USING` — so the
    * "dynamic" parts are data, not SQL text (no injection surface, and
    * the parameterized plan is byte-identical to the literal spelling;
    * ModernOps4Spec pins that). The oracle is the literal query. */
  private val q301 = Q(
    "q301_execute_immediate",
    """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM documents WHERE lang = 'en' AND source IS NOT NULL
      |GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql("DECLARE OR REPLACE VARIABLE graft_q301_tbl STRING DEFAULT 'documents'")
    s.sql("DECLARE OR REPLACE VARIABLE graft_q301_lang STRING DEFAULT 'en'")
    s.sql(
      """EXECUTE IMMEDIATE
        |  'SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |     CAST(sum(n_chars) AS BIGINT) AS total_chars
        |   FROM IDENTIFIER(?) WHERE lang = ? AND source IS NOT NULL
        |   GROUP BY source ORDER BY source'
        |  USING graft_q301_tbl, graft_q301_lang""".stripMargin)
  }


  /** NOT IN vs anti-join three-valued logic: the same exclusion
    * list with and without its NULLs — `NOT IN` over a NULL-bearing
    * list is vacuously empty, while filtering the NULLs (or an anti
    * join, which is null-rejecting on the key) gives the intended
    * answer; Spark plans the raw form as a null-aware anti join.
    */
  private val q336 = Q(
    "q336_null_aware_anti_join",
    s"""WITH ex AS ($ExclusionSql),
       |raw AS (
       |  SELECT count(*) AS n FROM part
       |  WHERE p_partkey NOT IN (SELECT pk FROM ex)),
       |nonnull AS (
       |  SELECT count(*) AS n FROM part
       |  WHERE p_partkey NOT IN (SELECT pk FROM ex WHERE pk IS NOT NULL)),
       |aj AS (
       |  SELECT count(*) AS n FROM part a
       |  WHERE NOT EXISTS (SELECT 1 FROM ex WHERE ex.pk = a.p_partkey))
       |SELECT 'not_in_raw' AS variant, CAST(n AS BIGINT) AS n FROM raw
       |UNION ALL
       |SELECT 'not_in_nonnull', CAST(n AS BIGINT) FROM nonnull
       |UNION ALL
       |SELECT 'anti_join', CAST(n AS BIGINT) FROM aj
       |ORDER BY variant""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.registerAll(s, dir)
    s.sql(
      s"""WITH ex AS ($ExclusionSql),
         |raw AS (
         |  SELECT count(*) AS n FROM part
         |  WHERE p_partkey NOT IN (SELECT pk FROM ex)),
         |nonnull AS (
         |  SELECT count(*) AS n FROM part
         |  WHERE p_partkey NOT IN
         |    (SELECT pk FROM ex WHERE pk IS NOT NULL)),
         |aj AS (
         |  SELECT count(*) AS n FROM part a
         |  WHERE NOT EXISTS (SELECT 1 FROM ex WHERE ex.pk = a.p_partkey))
         |SELECT 'not_in_raw' AS variant, CAST(n AS BIGINT) AS n FROM raw
         |UNION ALL
         |SELECT 'not_in_nonnull', CAST(n AS BIGINT) FROM nonnull
         |UNION ALL
         |SELECT 'anti_join', CAST(n AS BIGINT) FROM aj
         |ORDER BY variant""".stripMargin)
  }


  /** `try_*` semantics pin: `try_add` BIGINT overflow,
    * `try_divide` by zero, `try_to_number` on malformed strings —
    * each takes the NULL channel in Spark exactly where the DuckDB
    * oracle's explicit would-fail CASE predicate says it must
    * (positivity / zero-divisor / poisoned-or-signed input). Pins the
    * error-channel contract a pipeline relies on when it must never
    * abort on a poison row;
    */
  // ------------- q362: try_* error-channel semantics

  private val q362 = Q(
    "q362_try_arithmetic",
    """WITH e AS (
      |  SELECT
      |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
      |    user_id
      |  FROM events
      |  WHERE event_id IS NOT NULL AND value IS NOT NULL
      |    AND user_id IS NOT NULL AND event_type IS NOT NULL),
      |t AS (
      |  SELECT
      |    -- try_add(cents, MaxLong): overflows exactly when cents > 0
      |    CASE WHEN cents > 0 THEN NULL ELSE cents END AS add_residual,
      |    -- try_divide(cents, user_id % 7): NULL exactly at divisor 0
      |    CASE WHEN user_id % 7 = 0 THEN NULL ELSE cents END AS div_kept,
      |    -- try_to_number: poisoned prefix or a sign digit the format
      |    -- lacks -> NULL channel; clean non-negative integers parse
      |    CASE WHEN user_id % 3 <> 0 AND cents >= 0 THEN cents
      |         ELSE NULL END AS num_val
      |  FROM e)
      |SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN add_residual IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_add_overflow,
      |  CAST(sum(coalesce(add_residual, 0)) AS BIGINT) AS add_residual,
      |  CAST(sum(CASE WHEN div_kept IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_div_null,
      |  CAST(sum(coalesce(div_kept, 0)) AS BIGINT) AS div_kept_cents,
      |  CAST(sum(CASE WHEN num_val IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_num_null,
      |  CAST(sum(coalesce(num_val, 0)) AS BIGINT) AS num_sum
      |FROM t""".stripMargin) { (s, dir) =>
    val e = Tables.load(s, dir, "events")
      .filter(col("event_id").isNotNull && col("value").isNotNull &&
        col("user_id").isNotNull && col("event_type").isNotNull)
      .select(
        (col("value").cast(DecimalType(12, 2)) * 100).cast("long")
          .as("cents"),
        col("user_id"),
        // poison every 3rd user's string; negatives lack a sign slot in
        // the to_number format, so they too must take the NULL channel
        when(col("user_id") % 3 === 0,
          concat(lit("x"), col("value").cast(DecimalType(12, 2)) * 100))
          .otherwise(((col("value").cast(DecimalType(12, 2)) * 100)
            .cast("long")).cast("string")).as("numish"))
    val t = e.select(
      // the add value channel is MaxLong + cents: subtract the constant
      // back so the SUM stays in range (summing ~9e18 values would
      // itself overflow — silently in non-ANSI Spark, loudly in DuckDB)
      (expr("try_add(cents, 9223372036854775807L)")
        - lit(Long.MaxValue)).as("add_residual"),
      when(expr("try_divide(cents, user_id % 7)").isNotNull, col("cents"))
        .as("div_kept"),
      expr("try_to_number(numish, '999999999999999999')").cast("long")
        .as("num_val"))
    t.agg(count(lit(1)).as("n"),
      sum(when(col("add_residual").isNull, 1L).otherwise(0L))
        .as("n_add_overflow"),
      sum(coalesce(col("add_residual"), lit(0L))).as("add_residual"),
      sum(when(col("div_kept").isNull, 1L).otherwise(0L)).as("n_div_null"),
      sum(coalesce(col("div_kept"), lit(0L))).as("div_kept_cents"),
      sum(when(col("num_val").isNull, 1L).otherwise(0L)).as("n_num_null"),
      sum(coalesce(col("num_val"), lit(0L))).as("num_sum"))
      .select(col("n").cast("long").as("n"),
        col("n_add_overflow").cast("long").as("n_add_overflow"),
        col("add_residual").cast("long").as("add_residual"),
        col("n_div_null").cast("long").as("n_div_null"),
        col("div_kept_cents").cast("long").as("div_kept_cents"),
        col("n_num_null").cast("long").as("n_num_null"),
        col("num_sum").cast("long").as("num_sum"))
  }


  /** correlated scalar subqueries: per-order `(SELECT max(...))`
    * and `(SELECT count(*))` against lineitem in the SELECT list —
    * Catalyst's RewriteCorrelatedScalarSubquery turns each into a
    * left-outer aggregate join, so the declarative form stays
    * hash-join-shaped at scale; NULL-on-empty pinned via coalesce;
    */
  // ------------- q365: correlated scalar subqueries

  private val q365 = Q(
    "q365_correlated_scalar",
    """WITH o AS (
      |  SELECT o_orderkey, o_orderpriority, o_orderdate,
      |    (SELECT max(l.l_shipdate) FROM lineitem l
      |     WHERE l.l_orderkey = o_orderkey) AS last_ship,
      |    (SELECT count(*) FROM lineitem l
      |     WHERE l.l_orderkey = o_orderkey) AS n_items
      |  FROM orders
      |  WHERE o_orderkey IS NOT NULL AND o_orderdate IS NOT NULL)
      |SELECT o_orderpriority,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CASE WHEN last_ship IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_unshipped,
      |  CAST(sum(coalesce(datediff('day', CAST(o_orderdate AS DATE),
      |    CAST(last_ship AS DATE)), 0)) AS BIGINT) AS lag_days,
      |  CAST(sum(coalesce(n_items, 0)) AS BIGINT) AS items
      |FROM o GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "orders").createOrReplaceTempView("g_q365_orders")
    Tables.load(s, dir, "lineitem")
      .createOrReplaceTempView("g_q365_lineitem")
    s.sql(
      """WITH o AS (
        |  SELECT o_orderkey, o_orderpriority, o_orderdate,
        |    (SELECT max(l.l_shipdate) FROM g_q365_lineitem l
        |     WHERE l.l_orderkey = o_orderkey) AS last_ship,
        |    (SELECT count(*) FROM g_q365_lineitem l
        |     WHERE l.l_orderkey = o_orderkey) AS n_items
        |  FROM g_q365_orders
        |  WHERE o_orderkey IS NOT NULL AND o_orderdate IS NOT NULL)
        |SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CASE WHEN last_ship IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_unshipped,
        |  CAST(sum(coalesce(datediff(CAST(last_ship AS DATE),
        |    CAST(o_orderdate AS DATE)), 0)) AS BIGINT) AS lag_days,
        |  CAST(sum(coalesce(n_items, 0)) AS BIGINT) AS items
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin)
  }


  /** OR-predicate semi join: `EXISTS (… k1-match OR k2-match)`
    * cannot hash-join (no single equi key → nested loop). The scale
    * rewrite: a UNION of the two single-key SEMI joins (set union on
    * the probe side is exactly OR-exists semantics, duplicate-free
    * because semi joins never multiply rows). The Spark side runs the
    * decomposed form, the DuckDB oracle runs the raw OR-EXISTS — the
    * hash gate proves the rewrite; the spec pins the no-nested-loop
    * plan;
    */
  // ------------- q366: OR-predicate semi join → union of semi joins

  private val q366 = Q(
    "q366_or_semi_union",
    """WITH c AS (
      |  SELECT c_custkey AS k, c_mktsegment AS seg FROM customer
      |  WHERE c_custkey IS NOT NULL),
      |o AS (
      |  SELECT o_custkey AS direct_k, o_orderkey % 1500 AS referral_k
      |  FROM orders WHERE o_custkey IS NOT NULL)
      |SELECT c.seg, CAST(count(*) AS BIGINT) AS n_matched
      |FROM c
      |WHERE EXISTS (SELECT 1 FROM o
      |  WHERE o.direct_k = c.k OR o.referral_k = c.k)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val c = Tables.load(s, dir, "customer")
      .filter(col("c_custkey").isNotNull)
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"))
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_custkey").isNotNull)
      .select(col("o_custkey").as("direct_k"),
        (col("o_orderkey") % 1500).as("referral_k"))
    // OR-EXISTS decomposed: each disjunct is a hash LEFT SEMI join on
    // its own key; the union of the two probe-side row sets (dedup by
    // the customer key — semi joins never duplicate) IS the OR
    val byDirect = c.join(o, c("k") === o("direct_k"), "left_semi")
    val byReferral = c.join(o, c("k") === o("referral_k"), "left_semi")
    byDirect.unionByName(byReferral).distinct()
      .groupBy("seg")
      .agg(count(lit(1)).as("n_matched"))
      .select(col("seg"), col("n_matched").cast("long").as("n_matched"))
      .orderBy("seg")
  }


  def defs: Seq[Q] = Seq(q276, q277, q285, q286, q287, q295, q296, q298, q301, q336, q362, q365, q366)

}
