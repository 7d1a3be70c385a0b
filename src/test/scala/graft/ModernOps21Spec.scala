package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q351 life table, q352 correlation matrix, q353 OHLC bars. */
class ModernOps21Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def epochHour(ts: java.sql.Timestamp): Long =
    ts.getTime / 3600000L

  test("q351 matches a plain-Scala survival replay") {
    val ev = Tables.load(spark, dir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), epochHour(r.getTimestamp(1))))
    val mx = ev.map(_._2).max
    val perUser = ev.groupBy(_._1).values.map { xs =>
      val (f, l) = (xs.map(_._2).min, xs.map(_._2).max)
      (l - f, if (l >= mx - 23) 1L else 0L)
    }.toSeq
    val byDur = perUser.groupBy(_._1).map { case (d, xs) =>
      d -> (xs.count(_._2 == 0L).toLong, xs.count(_._2 == 1L).toLong) }
    val durs = byDur.keys.toSeq.sorted
    var cum = 0L
    val want = durs.map { d =>
      val atRisk = byDur.collect {
        case (d2, (ch, ce)) if d2 >= d => ch + ce }.sum
      val (ch, ce) = byDur(d)
      val hz = ch * 10000 / atRisk
      cum += hz
      (d, atRisk, ch, ce, hz, cum)
    }
    val got = SparkEntry.queries("q351_life_table")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === want)
    // at-risk is the standard decreasing risk set; every user appears once
    assert(got.head._2 === perUser.size.toLong)
    assert(got.map(r => r._3 + r._4).sum === perUser.size.toLong)
  }

  test("q352 numerators equal the direct series computation") {
    val ev = Tables.load(spark, dir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select("ts", "event_type", "user_id").collect()
      .map(r => (r.getTimestamp(0).toLocalDateTime.toLocalDate,
        r.getString(1), r.getLong(2)))
    val days = ev.map(_._1).distinct
    def series(f: Seq[(String, Long)] => Long) =
      days.map(d => d -> f(ev.filter(_._1 == d)
        .map(e => (e._2, e._3)).toSeq)).toMap
    val m = Map(
      "purchases" -> series(_.count(_._1 == "purchase").toLong),
      "views" -> series(_.count(_._1 == "view").toLong),
      "clicks" -> series(_.count(_._1 == "click").toLong),
      "users" -> series(_.map(_._2).distinct.size.toLong))
    val got = SparkEntry.queries("q352_corr_matrix")(spark, dir).collect()
    assert(got.length === 6)
    got.foreach { r =>
      val (a, b) = (m(r.getString(0)), m(r.getString(1)))
      assert(r.getString(0) < r.getString(1))
      val n = days.size.toLong
      val xs = days.map(a); val ys = days.map(b)
      assert(r.getLong(2) === n)
      assert(r.getLong(3) ===
        n * xs.zip(ys).map(p => p._1 * p._2).sum - xs.sum * ys.sum)
      assert(r.getLong(4) === n * xs.map(x => x * x).sum - xs.sum * xs.sum)
      assert(r.getLong(5) === n * ys.map(y => y * y).sum - ys.sum * ys.sum)
      // Cauchy–Schwarz: cov² ≤ var1·var2 (exact integers)
      assert(BigInt(r.getLong(3)).pow(2) <=
        BigInt(r.getLong(4)) * BigInt(r.getLong(5)))
    }
  }

  test("q353 bars match a per-bucket replay with deterministic ends") {
    val ev = Tables.load(spark, dir, "events")
      .filter(col("ts").isNotNull && col("value").isNotNull &&
        col("event_type").isNotNull)
      .select("event_type", "event_id", "ts", "value").collect()
      .map { r =>
        val ts = r.getTimestamp(2)
        (r.getString(0), epochHour(ts), ts.getTime, r.getLong(1),
          (BigDecimal(r.getDouble(3)).setScale(2,
            BigDecimal.RoundingMode.HALF_UP) * 100).toLong)
      }
    val want = ev.groupBy(e => (e._1, e._2)).map { case ((t, h), xs) =>
      val sorted = xs.sortBy(e => (e._3, e._4))
      (t, h) -> (sorted.head._5, xs.map(_._5).max, xs.map(_._5).min,
        sorted.last._5, xs.length.toLong, xs.map(_._5).sum)
    }
    val got = SparkEntry.queries("q353_ohlc_bars")(spark, dir).collect()
    assert(got.length === want.size)
    got.foreach { r =>
      val k = (r.getString(0), r.getLong(1))
      val (o, hi, lo, c, n, sc) = want(k)
      assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7)) === ((o, hi, lo, c, n, sc)), s"at $k")
      assert(lo <= o && o <= hi && lo <= c && c <= hi)
    }
  }
}
