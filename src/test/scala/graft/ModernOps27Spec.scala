package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q365 correlated scalars, q366 OR-semi union, q367 merkle sync. */
class ModernOps27Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q365 correlated scalars plan as aggregate joins, no loops") {
    val df = SparkEntry.queries("q365_correlated_scalar")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoopJoin"),
      "correlated scalar subqueries must decorrelate to hash joins")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // items conservation: Σ per-priority item counts = |lineitem|
    // restricted to orders present
    val orders = Tables.load(spark, dir, "orders")
      .filter(col("o_orderkey").isNotNull && col("o_orderdate").isNotNull)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val items = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey").collect().map(_.getLong(0))
      .count(orders.contains).toLong
    assert(rows.map(_.getLong(4)).sum === items)
    assert(rows.map(_.getLong(1)).sum === orders.size.toLong)
  }

  test("q366 union-of-semi-joins equals the naive OR-EXISTS, sans loop") {
    val naive = graft.operators.SqlSurfaceOps.orExistsNaive(spark, dir)
    assert(naive.queryExecution.executedPlan.toString
      .contains("NestedLoopJoin"),
      "the OR-predicate semi join must nested-loop without the rewrite")
    val want = naive.collect().map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    val df = SparkEntry.queries("q366_or_semi_union")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoopJoin"),
      s"decomposed form must hash-join, got:\n$plan")
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === want)
  }

  test("q367 flags exactly the buckets whose rows differ") {
    val base = Tables.load(spark, dir, "orders")
      .filter(col("o_orderkey").isNotNull)
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0),
        (BigDecimal(r.getDouble(1)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP) * 100).toLong))
    def digest(rows: Seq[(Long, Long)]) =
      rows.groupBy { case (k, _) => (k + 1073741824L) / 64 }
        .map { case (bkt, xs) =>
          bkt -> (xs.size.toLong,
            xs.map { case (k, c) => (c % 1000003) * (k % 997 + 1) }.sum)
        }
    val a = digest(base.filter(_._1 % 89 != 0).toSeq)
    val b = digest(base.filter(_._1 % 97 != 0).map { case (k, c) =>
      (k, c + (if (k % 31 == 0) 100L else 0L)) }.toSeq)
    val want = (a.keySet ++ b.keySet).filter { bkt =>
      a.getOrElse(bkt, (0L, 0L)) != b.getOrElse(bkt, (0L, 0L))
    }
    val got = SparkEntry.queries("q367_merkle_sync")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got.keySet === want)
    got.foreach { case (bkt, (na, nb, csa, csb)) =>
      assert((na, csa) === a.getOrElse(bkt, (0L, 0L)))
      assert((nb, csb) === b.getOrElse(bkt, (0L, 0L)))
    }
    // at sf0.001 the 1/31 edit density dirties every 64-key bucket, so
    // only the exact flag set is asserted; the movement saving shows up
    // at real scale (same density, vastly more buckets stay clean per
    // row moved — output is #dirty buckets, never #rows)
    assert(got.size <= (a.keySet ++ b.keySet).size)
  }
}
