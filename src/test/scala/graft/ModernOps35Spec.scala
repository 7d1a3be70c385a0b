package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q383 dedup savings, q384 revenue concentration. */
class ModernOps35Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q383 accounts a planted duplicate mix exactly") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_q383_fix").toString
    // 4 uniques, one pair, one triple — sizes 1/2/3; within the triple
    // the kept copy is the longest (max n_chars)
    val docs = Seq(
      (1L, "unique one", 10L), (2L, "unique two", 11L),
      (3L, "unique three", 12L), (4L, "unique four", 13L),
      (5L, "pair text", 20L), (6L, "pair text", 22L),
      (7L, "triple text", 30L), (8L, "triple text", 31L),
      (9L, "triple text", 29L))
      .map { case (id, t, c) => (id, t, "en", "web", c) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("q383_dedup_savings")(spark, tmp)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === Map(
      1L -> (4L, 0L, 0L),
      2L -> (1L, 1L, 20L),        // keep 22, reclaim 20
      3L -> (1L, 2L, 59L)))       // keep 31, reclaim 30+29
  }

  test("q383 on the fixture corpus conserves the document count") {
    val nDocs = Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull && col("n_chars").isNotNull).count()
    val got = SparkEntry.queries("q383_dedup_savings")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(r => r._1 * r._2).sum === nDocs)
    got.foreach { case (sz, groups, removable) =>
      assert(removable === (sz - 1) * groups)
    }
  }

  test("q384 concentration matches a per-segment replay") {
    val rev = Tables.load(spark, dir, "customer")
      .filter(col("c_custkey").isNotNull)
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val orders = Tables.load(spark, dir, "orders")
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0),
        (BigDecimal(r.getDouble(1)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP) * 100).toLong))
      .filter(o => rev.contains(o._1))
    val bySeg = orders.groupBy(o => rev(o._1)).map { case (seg, xs) =>
      val perCust = xs.groupBy(_._1).map { case (ck, ys) =>
        (ck, ys.map(_._2).sum) }.toSeq
      seg -> perCust
    }
    val got = SparkEntry.queries("q384_revenue_concentration")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    bySeg.foreach { case (seg, custs) =>
      val (n, total, p80) = got(seg)
      assert(n === custs.length.toLong)
      assert(total === custs.map(_._2).sum)
      val sorted = custs.sortBy(c => (-c._2, c._1)).map(_._2)
      val cums = sorted.scanLeft(0L)(_ + _).tail
      val wantP80 = cums.indexWhere(_ * 10 >= total * 8).toLong + 1
      assert(p80 === wantP80, s"at $seg")
      assert(p80 <= n, "p80 cut exists within the customer set")
    }
    assert(got.keySet === bySeg.keySet)
  }
}
