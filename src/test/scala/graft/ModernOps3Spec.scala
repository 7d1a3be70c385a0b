package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 surfaces, part 3 (q298–q300): each feature under test
  * changes the PLAN, not the answer — so every test pins BOTH sides:
  * the answer against an independent spelling, and the plan effect
  * (case-groups merged, files skipped, bloom filter injected) that
  * justifies the query's existence.
  */
class ModernOps3Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q298 collated grouping equals the lower()-wrapped spelling") {
    val got = SparkEntry.queries("q298_collated_group")(spark, dir)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    Tables.registerAll(spark, dir)
    val plain = spark.sql(
      """SELECT lower(k) AS source_ci, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(count_if(lower(k) = 'src1') AS BIGINT) AS n_src1
        |FROM (SELECT CASE WHEN doc_id % 3 = 1 THEN upper(source)
        |             ELSE source END AS k, n_chars
        |      FROM documents WHERE source IS NOT NULL)
        |GROUP BY lower(k) ORDER BY source_ci""".stripMargin)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === plain.toSeq)
    // the collation must have actually merged case variants: mod 3 is
    // coprime to the corpus's source = id mod 20 layout, so every group
    // mixes cases and a case-SENSITIVE group-by would see ~2x the groups
    val caseSensitive = spark.sql(
      """SELECT count(DISTINCT CASE WHEN doc_id % 3 = 1 THEN upper(source)
        |  ELSE source END) FROM documents WHERE source IS NOT NULL"""
        .stripMargin).head().getLong(0)
    assert(got.length < caseSensitive,
      s"collation merged nothing: ${got.length} groups vs " +
        s"$caseSensitive case-sensitive keys")
  }

  test("q299 zone map skips files and the pruned scan loses no rows") {
    val (total, kept, scan) = operators.LakehouseOps.zoneMapScan(spark, dir)
    assert(kept < total,
      s"zone map pruned nothing ($kept of $total files kept) — the " +
        "range-partitioned layout should put out-of-range files on " +
        "both ends")
    assert(kept > 0, "interior predicate must keep at least one file")
    val pred = col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
      col("l_shipdate") < lit("1996-07-01").cast("timestamp")
    val prunedCount = scan.filter(pred).count()
    val fullCount = Tables.load(spark, dir, "lineitem").filter(pred).count()
    assert(prunedCount === fullCount,
      "pruning dropped rows the predicate matches — zone map is unsound")
  }

  test("q300 injects a runtime bloom filter and matches the plain join") {
    val df = operators.OptimizerOps.withBloomConfs(spark) {
      val f = operators.OptimizerOps.bloomJoinFrame(spark, dir)
      f.collect() // plans finalize at execution; inspect after
      val plan = f.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        "runtime bloom filter was not injected:\n" + plan)
      f
    }
    val got = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2)))
    Tables.registerAll(spark, dir)
    val plain = spark.sql(
      """SELECT CAST(year(o.o_orderdate) AS BIGINT) AS yr,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS STRING)
        |    AS revenue
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_totalprice > 490000
        |GROUP BY 1 ORDER BY 1""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq === plain.toSeq,
      "bloom-filtered join must be answer-identical to the plain join")
  }
}
