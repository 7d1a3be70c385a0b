package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q348 cohort LTV, q349 basket rules, q350 ACF profile. */
class ModernOps20Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def epochDay(ts: java.sql.Timestamp): Long =
    ts.toLocalDateTime.toLocalDate.toEpochDay

  test("q348 matches a plain-Scala cohort/age recomputation") {
    val ev = Tables.load(spark, dir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .select("user_id", "ts", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), epochDay(r.getTimestamp(1)), r.getString(2),
        if (r.isNullAt(3)) None
        else Some(BigDecimal(r.getDouble(3)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP) * 100)))
    val cohort = ev.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).min }
    val spend = ev.groupBy(e => (cohort(e._1), e._2 - cohort(e._1)))
      .map { case ((c, age), xs) =>
        (c, age) -> (
          xs.collect { case (_, _, "purchase", Some(cents)) =>
            cents.toLong }.sum,
          xs.map(_._1).distinct.size.toLong)
      }
    val want = spend.keys.toSeq.sorted.map { case (c, age) =>
      val cum = spend.collect {
        case ((`c`, a), (cents, _)) if a <= age => cents }.sum
      (c, age, spend((c, age))._2, spend((c, age))._1, cum)
    }
    val got = SparkEntry.queries("q348_cohort_ltv")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === want)
    // the triangle is cumulative: cum_cents non-decreasing within a cohort
    got.groupBy(_._1).values.foreach { rows =>
      val cums = rows.sortBy(_._2).map(_._5)
      assert(cums === cums.scanLeft(0L)(math.max).tail)
    }
  }

  test("q349 pair supports match a direct basket recount") {
    val items = Tables.load(spark, dir, "lineitem")
      .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nBaskets = items.map(_._1).distinct.size.toLong
    val isup = items.groupBy(_._2).map { case (p, xs) => p -> xs.size.toLong }
    val pairCounts = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.size) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
      .filter(_._2 >= 3)
    val got = SparkEntry.queries("q349_basket_rules")(spark, dir).collect()
    assert(got.length === pairCounts.size)
    got.foreach { r =>
      val (p1, p2, s12) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (s1, s2) = (r.getLong(3), r.getLong(4))
      assert(s12 === pairCounts((p1, p2)))
      assert(s1 === isup(p1) && s2 === isup(p2))
      assert(s12 <= math.min(s1, s2), "support can't exceed item support")
      assert(r.getLong(5) === s12 * 10000 / nBaskets)
      assert(r.getLong(6) === s12 * 10000 / s1)
      assert(r.getLong(7) === s12 * 10000 / s2)
      assert(r.getLong(8) === s12 * nBaskets * 10000 / (s1 * s2))
    }
  }

  test("q350 numerators match a direct series replay") {
    val daily = Tables.load(spark, dir, "events")
      .filter(col("ts").isNotNull && col("event_type") === "purchase")
      .collect()
    val series = Tables.load(spark, dir, "events")
      .filter(col("ts").isNotNull && col("event_type") === "purchase")
      .select("ts").collect()
      .groupBy(r => epochDay(r.getTimestamp(0)))
      .map { case (d, xs) => d -> xs.length.toLong }
    val got = SparkEntry.queries("q350_acf_profile")(spark, dir).collect()
    assert(got.map(_.getLong(0)).toSeq === (1L to 7L))
    got.foreach { r =>
      val lag = r.getLong(0)
      val pairs = series.toSeq.flatMap { case (t, x) =>
        series.get(t + lag).map(z => (x, z)) }
      val n = pairs.size.toLong
      val (sx, sz) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      assert(r.getLong(1) === n)
      assert(r.getLong(2) ===
        n * pairs.map(p => p._1 * p._2).sum - sx * sz)
      assert(r.getLong(3) ===
        n * pairs.map(p => p._1 * p._1).sum - sx * sx)
      assert(r.getLong(4) ===
        n * pairs.map(p => p._2 * p._2).sum - sz * sz)
    }
    assert(daily.nonEmpty)
  }
}
