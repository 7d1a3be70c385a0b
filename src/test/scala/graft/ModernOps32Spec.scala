package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q378 stratified split, q379 backlog sweep. */
class ModernOps32Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private val M32 = 4294967296L
  private def h(x: Long): Long = Math.floorMod(x * 2654435761L, M32)

  test("q378 split is the exact 70/15/15 rank allocation per stratum") {
    val docs = Tables.load(spark, dir, "documents")
      .filter(col("doc_id").isNotNull && col("lang").isNotNull)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.groupBy(_._2).toSeq.flatMap { case (lang, xs) =>
      val sorted = xs.map(_._1).sortBy(id => (h(id), id))
      val n = sorted.length
      sorted.zipWithIndex.map { case (id, i) =>
        val rk = i + 1
        val split = if (rk * 10 <= n * 7) "train"
          else if (rk * 20 <= n * 17) "val" else "test"
        ((lang, split), id)
      }
    }.groupBy(_._1).map { case (k, xs) =>
      k -> ((xs.size.toLong,
        xs.map(x => Math.floorMod(x._2, 1000003L)).sum))
    }
    val got = SparkEntry.queries("q378_stratified_split")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got === want)
    // proportions: within each stratum, |train| is 70% ±1 row etc.
    got.keys.map(_._1).toSeq.distinct.foreach { lang =>
      val n = got.collect { case ((`lang`, _), (c, _)) => c }.sum
      val train = got.getOrElse((lang, "train"), (0L, 0L))._1
      assert(math.abs(train - n * 7 / 10) <= 1, s"$lang train share")
    }
  }

  test("q379 backlog equals a direct interval-stabbing count") {
    val orders = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate").isNotNull)
      .select(col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val lastShip = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate").isNotNull)
      .select(col("l_orderkey"),
        datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
          .cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val ivs = orders.toSeq.flatMap { case (ok, lo) =>
      lastShip.get(ok).map(hi => (lo, hi)) }.filter(p => p._1 <= p._2)
    val got = SparkEntry.queries("q379_backlog_sweep")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val (mn, mx) = (ivs.map(_._1).min, ivs.map(_._2).max)
    assert(got.map(_._1) === (mn to mx))
    got.foreach { case (d, open) =>
      assert(open === ivs.count(iv => iv._1 <= d && d <= iv._2).toLong,
        s"at day $d")
    }
    assert(got.last._2 >= 1L, "intervals ending at mx keep it open")
  }
}
