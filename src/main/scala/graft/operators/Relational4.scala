package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Round-8 modern-SQL dialect surfaces: `GROUP BY ALL` / `ORDER BY ALL`
  * with `LIMIT ... OFFSET`, and lateral column aliases. Both compile to
  * the same Catalyst plans as their explicit spellings (the oracle
  * equality proves value parity), so the ergonomic surface costs
  * nothing at any scale; they're kept as executed queries so the
  * dialect stays covered by the gate.
  */
object Relational4 {

  private val q218 = Q(
    "q218_group_order_all",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS sum_qty
      |FROM lineitem
      |GROUP BY ALL ORDER BY ALL NULLS FIRST LIMIT 4 OFFSET 2""".stripMargin) {
    (s, dir) =>
    // GROUP BY ALL infers the non-aggregate output columns; ORDER BY
    // ALL orders by every output column left-to-right — a total order
    // here because the group keys are unique — which makes the
    // LIMIT/OFFSET page deterministic. The monetary sum ships as a
    // fixed-scale decimal string (q01 pattern). The oracle pins NULLS
    // FIRST: Spark ascending sorts default NULLS FIRST but DuckDB
    // defaults NULLS LAST, and with NULL group keys in play (the
    // adversarial corpus) the OFFSET page would otherwise differ.
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS sum_qty
        |FROM lineitem
        |GROUP BY ALL ORDER BY ALL LIMIT 4 OFFSET 2""".stripMargin)
  }

  /** Shared text: both engines support lateral column aliases, so the
    * oracle runs the IDENTICAL statement — p2 references p and sz
    * references p2 inside one SELECT list; the outer query ships the
    * decimals as strings. */
  private val LateralSql =
    """SELECT o_orderkey, CAST(p AS VARCHAR) AS p, CAST(p2 AS VARCHAR) AS p2, sz
      |FROM (
      |  SELECT o_orderkey,
      |    CAST(o_totalprice AS DECIMAL(12,2)) AS p,
      |    p * 2 AS p2,
      |    CASE WHEN p2 > 300000 THEN 'big' ELSE 'small' END AS sz
      |  FROM orders WHERE o_orderkey <= 100)
      |ORDER BY o_orderkey""".stripMargin

  private val q219 = Q(
    "q219_lateral_alias",
    LateralSql) { (s, dir) =>
    // Lateral column aliases: Catalyst rewrites the intra-SELECT alias
    // references into nested projections — same plan as the explicit
    // spelling, zero scale cost. Spark's only spelling difference from
    // the oracle is STRING vs VARCHAR.
    Tables.registerAll(s, dir)
    s.sql(LateralSql.replace("AS VARCHAR", "AS STRING"))
  }

  val defs: Seq[Q] = Seq(q218, q219)
}
