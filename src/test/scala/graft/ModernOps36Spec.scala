package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q385 lead-time box stats, q386 quarterly mix drift. */
class ModernOps36Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q385 order statistics match a per-priority replay") {
    val orders = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate").isNotNull)
      .select(col("o_orderkey"), col("o_orderpriority"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("long")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val firstShip = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate").isNotNull)
      .select(col("l_orderkey"),
        datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
          .cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val leads = orders.toSeq.flatMap { case (k, (pri, od)) =>
      firstShip.get(k).map(sd => (pri, k, sd - od)) }
    val want = leads.groupBy(_._1).map { case (pri, xs) =>
      val sorted = xs.sortBy(x => (x._3, x._2)).map(_._3)
      val n = sorted.length
      pri -> (n.toLong, sorted.head, sorted(((n + 1) / 2) - 1),
        sorted(((n * 9 + 9) / 10) - 1), sorted.last)
    }
    val got = SparkEntry.queries("q385_leadtime_box")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got === want)
    got.values.foreach { case (_, mn, p50, p90, mx) =>
      assert(mn <= p50 && p50 <= p90 && p90 <= mx)
    }
  }

  test("q386 shares sum to ~10000 bp per quarter and drift telescopes") {
    val rows = SparkEntry.queries("q386_mix_drift")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    // per quarter, floor-rounded shares land within 5 bp of 10000
    rows.groupBy(_._1).values.foreach { qs =>
      val s = qs.map(_._4).sum
      assert(s <= 10000 && s > 10000 - 5 * qs.length)
    }
    // drift is exactly the share delta vs the previous quarter
    rows.groupBy(_._2).values.foreach { ps =>
      val sorted = ps.sortBy(_._1)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._5 === Some(b._4 - a._4))
        case _ =>
      }
      assert(sorted.head._5 === None, "first quarter has no prior")
    }
  }
}
