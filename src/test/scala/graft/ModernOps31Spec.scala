package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q375 inter-arrival hist, q376 dow index, q377 growth accounting. */
class ModernOps31Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000 + ts.getNanos / 1000 % 1000

  test("q375 buckets equal a direct gap replay") {
    val evs = Tables.load(spark, dir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_type").isNotNull)
      .select("user_id", "event_type", "event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        micros(r.getTimestamp(3))))
    val want = evs.groupBy(e => (e._1, e._2)).values.flatMap { xs =>
      val sorted = xs.sortBy(e => (e._4, e._3))
      sorted.sliding(2).collect { case Array(a, b) =>
        (a._2, 63 - java.lang.Long.numberOfLeadingZeros(
          math.max(b._4 - a._4, 1)).toLong)
      }
    }.toSeq.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val got = SparkEntry.queries("q375_interarrival_histogram")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // bin(0) has one digit, so gap 0 and 1 share bucket 0 — the replay
    // maps gaps 0/1 → bucket 0 identically via max(gap, 1)
    assert(got === want)
  }

  test("q376 index is the exact cross-multiplied seasonality ratio") {
    val daily = Tables.load(spark, dir, "events")
      .filter(col("ts").isNotNull && col("event_type") === "purchase")
      .select("ts").collect()
      .map(r => r.getTimestamp(0).toLocalDateTime.toLocalDate.toEpochDay)
      .groupBy(identity).map { case (d, xs) => d -> xs.size.toLong }
    val nDays = daily.size.toLong
    val total = daily.values.sum
    val want = daily.groupBy { case (d, _) => (d + 4) % 7 }
      .map { case (dow, xs) =>
        dow -> (xs.size.toLong, xs.values.sum,
          xs.values.sum * nDays * 10000 / (total * xs.size)) }
    val got = SparkEntry.queries("q376_dow_seasonality")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === want)
    // index masses balance: Σ dow_days·index ≈ n_days·10000 within
    // integer-floor slack
    val slack = got.values.map(v => v._1 * v._3).sum
    assert(slack <= nDays * 10000 && slack > nDays * 10000 - 70000)
  }

  test("q377 ledger satisfies the growth-accounting identities") {
    val act = Tables.load(spark, dir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0),
        r.getTimestamp(1).toLocalDateTime.toLocalDate.toEpochDay))
      .distinct
    val byDay = act.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val firstDay = act.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val got = SparkEntry.queries("q377_growth_accounting")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet === byDay.keySet.map(identity))
    got.foreach { case (d, (actives, nu, ret, res, chu)) =>
      val today = byDay(d)
      val yest = byDay.getOrElse(d - 1, Set.empty[Long])
      assert(actives === today.size.toLong)
      assert(nu === today.count(u => firstDay(u) == d).toLong)
      assert(ret === today.count(u =>
        firstDay(u) < d && yest.contains(u)).toLong)
      assert(res === today.count(u =>
        firstDay(u) < d && !yest.contains(u)).toLong)
      assert(chu === yest.count(u => !today.contains(u)).toLong)
      assert(actives === nu + ret + res, "the ledger identity must hold")
    }
  }
}
