package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q382 referential-integrity audit. */
class ModernOps34Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q382 orphan counts match direct key-set differences") {
    def keys(table: String, column: String): Array[Long] =
      Tables.load(spark, dir, table)
        .filter(col(column).isNotNull)
        .select(col(column).cast("long")).collect().map(_.getLong(0))
    val edges = Seq(
      ("orders.custkey->customer", "orders", "o_custkey",
        "customer", "c_custkey"),
      ("lineitem.orderkey->orders", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      ("lineitem.partkey->part", "lineitem", "l_partkey",
        "part", "p_partkey"),
      ("lineitem.suppkey->supplier", "lineitem", "l_suppkey",
        "supplier", "s_suppkey"),
      ("customer.nationkey->nation", "customer", "c_nationkey",
        "nation", "n_nationkey"),
      ("nation.regionkey->region", "nation", "n_regionkey",
        "region", "r_regionkey"))
    val got = SparkEntry.queries("q382_ri_audit")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet === edges.map(_._1).toSet)
    edges.foreach { case (name, ct, ck, pt, pk) =>
      val child = keys(ct, ck)
      val parents = keys(pt, pk).toSet
      val orphans = child.count(k => !parents.contains(k)).toLong
      assert(got(name) === ((child.length.toLong, orphans,
        orphans * 10000 / child.length)), s"at $name")
    }
    // the clean TPC-H-ish fixture must be orphan-free — a nonzero row
    // here means the generator broke, which is exactly the audit's job
    assert(got.values.forall(_._2 == 0L))
  }
}
