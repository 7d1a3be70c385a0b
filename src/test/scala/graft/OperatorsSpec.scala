package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sanity specs over the registered query inventory at sf0.001 — the
  * deep correctness gate is the driver's DuckDB hash-compare
  * (tools/verify_local.sh); these pin basic shape and a few exact
  * values so `sbt test` catches regressions without DuckDB. */
class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("all registered queries have unique names and oracles reference them") {
    val names = SparkEntry.defs.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(names.toSet))
  }

  test("entry smoke: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q01 pricing summary: 6 groups with exact decimal-derived sums") {
    val rows = SparkEntry.queries("q01_pricing_summary")(spark, TestSpark.sf).collect()
    assert(rows.length == 6)
    val first = rows.head
    assert(first.getString(0) == "A" && first.getString(1) == "F")
    assert(first.getLong(first.fieldIndex("count_order")) > 0)
  }

  test("q07/q08 semi+anti partition the customer set") {
    val semi = SparkEntry.queries("q07_join_semi")(spark, TestSpark.sf).count()
    val anti = SparkEntry.queries("q08_join_anti")(spark, TestSpark.sf).count()
    assert(semi > 0 && anti > 0)
  }

  test("q45 minhash-LSH equals exact jaccard pairs at threshold 0.9 (recall 1)") {
    val exact = SparkEntry.queries("q44_ngram_jaccard")(spark, TestSpark.sf)
      .filter("jaccard >= 0.9")
      .selectExpr("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("q45_minhash_lsh")(spark, TestSpark.sf)
      .selectExpr("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
  }

  test("q47 cosine top-k: 5 neighbors per query, ranks 1..5, sims descending") {
    val rows = SparkEntry.queries("q47_cosine_topk")(spark, TestSpark.sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 20)
    byQ.values.foreach { g =>
      assert(g.map(_.getLong(3)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      val sims = g.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q197 vocab ids follow the (freq desc, token) total order with no gaps") {
    val dir = TestSpark.sf
    val toks = Tables.load(spark, dir, "documents")
      .select("text").collect().map(_.getString(0))
      .flatMap(_.split(" ", -1)).filter(_.nonEmpty)
    val expected = toks.groupBy(identity).map { case (t, g) => (t, g.length.toLong) }
      .toSeq.sortBy { case (t, c) => (-c, t) }
      .zipWithIndex.map { case ((t, c), i) => (i.toLong, t, c) }
    val got = SparkEntry.queries("q197_vocab_build")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(got.map(_._1) == got.indices.map(_.toLong), "ids must be dense 0..n-1")
  }

  test("q198 join-skew preflight equals a plain count-product top-10") {
    val dir = TestSpark.sf
    val l = Tables.load(spark, dir, "orders").select("o_custkey").collect()
      .map(_.getLong(0)).groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val r = Tables.load(spark, dir, "customer").select("c_custkey").collect()
      .map(_.getLong(0)).groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val expected = l.keySet.intersect(r.keySet).toSeq
      .map(k => (k, l(k), r(k), l(k) * r(k)))
      .sortBy { case (k, _, _, est) => (-est, k) }.take(10)
    val got = SparkEntry.queries("q198_join_skew_preflight")(spark, dir).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSeq
    assert(got == expected)
  }
}
