package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 surfaces, part 34 — the referential-integrity dashboard:
  *
  *  - q382 RI audit: every declared FK edge of the schema checked in
  *    one report — child rows, orphans (left anti join on the parent
  *    key), and orphan share in bp. Each edge is a broadcast-or-hash
  *    anti join on its own key (counts only, no row material), the
  *    whole audit a union of six independent linear passes — the
  *    constraint sweep a lakehouse runs after every backfill, since
  *    nothing enforces FKs at write time.
  */
object ModernOps34 {

  private case class Edge(name: String, childTable: String,
      childKey: String, parentTable: String, parentKey: String)

  private val Edges = Seq(
    Edge("orders.custkey->customer", "orders", "o_custkey",
      "customer", "c_custkey"),
    Edge("lineitem.orderkey->orders", "lineitem", "l_orderkey",
      "orders", "o_orderkey"),
    Edge("lineitem.partkey->part", "lineitem", "l_partkey",
      "part", "p_partkey"),
    Edge("lineitem.suppkey->supplier", "lineitem", "l_suppkey",
      "supplier", "s_suppkey"),
    Edge("customer.nationkey->nation", "customer", "c_nationkey",
      "nation", "n_nationkey"),
    Edge("nation.regionkey->region", "nation", "n_regionkey",
      "region", "r_regionkey"))

  private def edgeSql(e: Edge): String =
    s"""SELECT '${e.name}' AS fk,
       |  CAST(count(*) AS BIGINT) AS child_rows,
       |  CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS orphans,
       |  CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) * 10000
       |    // count(*) AS BIGINT) AS orphan_bp
       |FROM (SELECT ${e.childKey} AS k FROM ${e.childTable}
       |      WHERE ${e.childKey} IS NOT NULL) c
       |LEFT JOIN (SELECT DISTINCT ${e.parentKey} AS k
       |           FROM ${e.parentTable}) p ON p.k = c.k""".stripMargin

  private val q382 = Q(
    "q382_ri_audit",
    Edges.map(edgeSql).mkString("", "\nUNION ALL\n", "\nORDER BY fk")) {
    (s, dir) =>
    // fully declarative: one left join + one aggregate per edge, no
    // driver-side counts — the union stays a single Spark job
    def audit(e: Edge): DataFrame = {
      val child = Tables.load(s, dir, e.childTable)
        .filter(col(e.childKey).isNotNull)
        .select(col(e.childKey).as("k"))
      val parent = Tables.load(s, dir, e.parentTable)
        .select(col(e.parentKey).as("pk")).distinct()
      child.join(parent, col("k") === col("pk"), "left")
        .agg(count(lit(1)).as("child_rows"),
          sum(when(col("pk").isNull, 1L).otherwise(0L)).as("orphans"))
        .select(lit(e.name).as("fk"),
          col("child_rows").cast("long").as("child_rows"),
          col("orphans").cast("long").as("orphans"),
          expr("orphans * 10000 div child_rows").cast("long")
            .as("orphan_bp"))
    }
    Edges.map(audit).reduce(_ unionByName _).orderBy("fk")
  }

  val defs: Seq[Q] = Seq(q382)
}
