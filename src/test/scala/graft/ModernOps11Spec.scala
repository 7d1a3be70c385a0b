package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q319 CBO stats, q320 bloom file index, q321 PPJoin. */
class ModernOps11Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q319 ANALYZE statistics reach the optimizer and values hold") {
    operators.OptimizerOps.withCboConfs(spark) {
      val df = operators.OptimizerOps.cboFrame(spark, dir)
      // every catalog relation in the optimized plan must carry a
      // rowCount — the proof ANALYZE flowed through the catalog into
      // costing (without stats rowCount is None under CBO)
      val rels = df.queryExecution.optimizedPlan.collectLeaves()
      assert(rels.nonEmpty)
      rels.foreach { leaf =>
        assert(leaf.stats.rowCount.isDefined,
          s"relation without rowCount stats under CBO: $leaf")
      }
      val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      Tables.registerAll(spark, dir)
      val plain = spark.sql(
        """SELECT l.l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
          |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS STRING)
          |    AS revenue
          |FROM lineitem l
          |JOIN orders o ON l.l_orderkey = o.o_orderkey
          |JOIN customer c ON o.o_custkey = c.c_custkey
          |WHERE c.c_custkey % 50 = 3
          |GROUP BY 1 ORDER BY 1""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      assert(got.toSeq === plain.toSeq)
    }
  }

  test("q320 bloom index prunes files and loses no rows") {
    val (total, kept, scan, key) =
      operators.LakehouseOps.bloomIndexScan(spark, dir)
    assert(kept > 0 && kept < total,
      s"bloom index must prune some files ($kept of $total kept) — a " +
        "single orderkey cannot populate every shipdate-range file's bloom")
    val pruned = scan.filter(col("l_orderkey") === key).count()
    val full = Tables.load(spark, dir, "lineitem")
      .filter(col("l_orderkey") === key).count()
    assert(pruned === full && full > 0,
      "bloom pruning dropped rows of the looked-up key")
  }

  test("q321 prefix filter is exact: equals brute-force all-pairs") {
    val got = SparkEntry.queries("q321_ppjoin_exact_similarity")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // brute force over the same distinct-token sets
    val sets = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (id, ws) => id -> ws.map(_._2).toSet }
    val want = (for {
      (d1, s1) <- sets; (d2, s2) <- sets if d1 < d2
      inter = (s1 & s2).size
      union = s1.size + s2.size - inter
      if inter * 20 >= 19 * union
    } yield (d1, d2, inter.toLong, union.toLong)).toSet
    assert(got === want,
      s"prefix-filtered join must equal brute force " +
        s"(got ${got.size}, want ${want.size} pairs)")
    assert(want.nonEmpty, "fixture must contain at least one near-dup pair")
  }
}
