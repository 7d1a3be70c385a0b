package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q355 snapshot diff, q356 calendar spine. */
class ModernOps23Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q355 classification matches a direct key-set replay") {
    val base = Tables.load(spark, dir, "orders")
      .filter(col("o_orderkey").isNotNull)
      .select("o_orderkey", "o_totalprice", "o_orderstatus",
        "o_orderpriority")
      .collect()
      .map(r => (r.getLong(0),
        (BigDecimal(r.getDouble(1)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP) * 100).toLong,
        r.getString(2), r.getString(3)))
    val a = base.filter(_._1 % 89 != 0).map(x => x._1 -> x).toMap
    val b = base.filter(_._1 % 97 != 0).map { case (k, c, st, pr) =>
      k -> (k, c + (if (k % 31 == 0) 100L else 0L),
        if (k % 37 == 0) "X" else st, pr)
    }.toMap
    val statuses = (a.keySet ++ b.keySet).toSeq.map { k =>
      (a.get(k), b.get(k)) match {
        case (None, Some(_)) => ("added", false, false, false)
        case (Some(_), None) => ("removed", false, false, false)
        case (Some(x), Some(y)) =>
          val (dc, ds, dp) = (x._2 != y._2, x._3 != y._3, x._4 != y._4)
          (if (dc || ds || dp) "changed" else "unchanged", dc, ds, dp)
        case _ => fail("key in neither side")
      }
    }
    val want = statuses.groupBy(_._1).map { case (st, xs) =>
      st -> (xs.size.toLong, xs.count(_._2).toLong, xs.count(_._3).toLong,
        xs.count(_._4).toLong)
    }
    val got = SparkEntry.queries("q355_snapshot_diff")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got === want)
    assert(Set("added", "removed", "changed", "unchanged")
      .subsetOf(got.keySet), "fixture must exercise all four statuses")
    // conservation: every base key lands in exactly one bucket
    assert(got.values.map(_._1).sum === (a.keySet ++ b.keySet).size.toLong)
  }

  test("q356 spine is gap-free and conserves order mass") {
    val rows = SparkEntry.queries("q356_calendar_spine")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val orders = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate").isNotNull)
      .select(to_date(col("o_orderdate")).as("d"), col("o_totalprice"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate,
        (BigDecimal(r.getDouble(1)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP) * 100).toLong))
    val (lo, hi) = (orders.map(_._1).min, orders.map(_._1).max)
    val spanDays = java.time.temporal.ChronoUnit.DAYS.between(lo, hi) + 1
    assert(rows.map(_._3).sum === spanDays,
      "spine day count must equal the full closed span")
    assert(rows.map(_._5).sum === orders.length.toLong)
    assert(rows.map(_._6).sum === orders.map(_._2).sum)
    assert(rows.forall(r => r._2 >= 1 && r._2 <= 4))
    assert(rows.forall(r => r._4 <= r._3), "active_days ≤ n_days")
    // fiscal mapping replay on the spine ends
    def fy(d: java.time.LocalDate) =
      d.getYear + (if (d.getMonthValue >= 2) 1 else 0)
    def fq(d: java.time.LocalDate) = ((d.getMonthValue + 10) % 12) / 3 + 1
    assert(rows.exists(r => r._1 == fy(lo) && r._2 == fq(lo)))
    assert(rows.exists(r => r._1 == fy(hi) && r._2 == fq(hi)))
  }
}
