package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-9 surfaces, part 24 — incremental JOIN-view maintenance:
  *
  *  - q358 join-MV delta: the classic IVM identity
  *    `Δ(O ⋈ C) = ΔO⋈C₀ ∪ O₀⋈ΔC ∪ ΔO⋈ΔC` driven end-to-end. The
  *    fixture splits orders/customer into base and late-arriving
  *    deltas by key-mod; the Spark side materializes the view state
  *    J₀ = O₀⋈C₀, computes the three delta joins, unions, and
  *    aggregates per market segment — the DuckDB oracle aggregates
  *    the FULL join from scratch, so cross-engine equality proves the
  *    maintenance identity (no lost, duplicated, or double-counted
  *    pairs). At 100 TB this is the difference between re-joining two
  *    fact tables nightly and joining only the day's deltas: every
  *    delta join is linear in |Δ|, and the union never materializes
  *    the historical view.
  */
object ModernOps24 {

  private val q358 = Q(
    "q358_join_mv_delta",
    """WITH o AS (
      |  SELECT o_orderkey AS ok, o_custkey AS ck,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders
      |  WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL),
      |c AS (
      |  SELECT c_custkey AS ck, c_mktsegment AS seg FROM customer
      |  WHERE c_custkey IS NOT NULL)
      |SELECT c.seg, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(o.cents) AS BIGINT) AS cents
      |FROM o JOIN c ON o.ck = c.ck
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_orderkey").isNotNull && col("o_custkey").isNotNull)
      .select(col("o_orderkey").as("ok"), col("o_custkey").as("ck"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast("long")
          .as("cents"))
    val c = Tables.load(s, dir, "customer")
      .filter(col("c_custkey").isNotNull)
      .select(col("c_custkey").as("ck"), col("c_mktsegment").as("seg"))
    // late-arriving deltas by key-mod; base = the rest
    val dO = o.filter(col("ok") % 10 === 7)
    val o0 = o.filter(col("ok") % 10 =!= 7)
    val dC = c.filter(col("ck") % 13 === 5)
    val c0 = c.filter(col("ck") % 13 =!= 5)
    val j0 = o0.join(c0, "ck") // the maintained view's standing state
    val delta = dO.join(c0, "ck")
      .unionByName(o0.join(dC, "ck"))
      .unionByName(dO.join(dC, "ck"))
    j0.unionByName(delta)
      .groupBy("seg")
      .agg(count(lit(1)).as("n_orders"), sum("cents").as("cents"))
      .select(col("seg"), col("n_orders").cast("long").as("n_orders"),
        col("cents").cast("long").as("cents"))
      .orderBy("seg")
  }

  val defs: Seq[Q] = Seq(q358)
}
