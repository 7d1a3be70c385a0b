package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q357 streaming OHLC, q358 join-MV delta maintenance. */
class ModernOps24Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q357 streaming bars equal the q353 batch bars exactly") {
    val batch = SparkEntry.queries("q353_ohlc_bars")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val stream = SparkEntry.queries("q357_stream_ohlc")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(stream === batch,
      "a streaming bar pipeline that disagrees with its batch twin " +
        "has nondeterministic open/close or broken state merge")
    assert(stream.nonEmpty)
  }

  test("q358 delta-maintained view equals the from-scratch join") {
    val got = SparkEntry.queries("q358_join_mv_delta")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderkey").isNotNull && col("o_custkey").isNotNull)
      .select(col("o_custkey").as("ck"), col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0),
        (BigDecimal(r.getDouble(1)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP) * 100).toLong))
    val seg = Tables.load(spark, dir, "customer")
      .filter(col("c_custkey").isNotNull)
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = o.flatMap { case (ck, cents) => seg.get(ck).map(_ -> cents) }
      .groupBy(_._1).map { case (sg, xs) =>
        (sg, xs.length.toLong, xs.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    assert(got === want)
    // the three delta terms are pairwise disjoint by construction:
    // (ΔO,C₀), (O₀,ΔC), (ΔO,ΔC) partition the new pairs
    val total = got.map(_._2).sum
    assert(total === o.count(x => seg.contains(x._1)).toLong,
      "every (order, customer) pair must appear exactly once")
  }
}
