package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q331 HITS, q332 Benford audit, q333 point-in-time features. */
class ModernOps15Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q331 equals an integer-math HITS replay; top score is 10000") {
    val rows = SparkEntry.queries("q331_hits_hubs_authorities")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val auths = rows.filter(_._1 == "authority")
      .map(r => r._2 -> r._3).toMap
    assert(auths.values.max === 10000L,
      "max-normalization must pin the top authority at scale")
    val edges = Tables.load(spark, dir, "events")
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
      .select("user_id", "event_type").distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    var h = edges.map(_._1).distinct.map(_ -> 10000L).toMap
    var a = Map.empty[String, Long]
    for (_ <- 1 to 3) {
      val ar = edges.groupBy(_._2).map { case (t, es) =>
        t -> es.map(e => h(e._1)).sum }
      val am = ar.values.max
      a = ar.map { case (t, s) => t -> s * 10000L / am }
      val hr = edges.groupBy(_._1).map { case (u, es) =>
        u -> es.map(e => a(e._2)).sum }
      val hm = hr.values.max
      h = hr.map { case (u, s) => u -> s * 10000L / hm }
    }
    assert(auths === a, "authority scores differ from the replay")
    val bands = rows.filter(_._1 == "hub_band")
      .map(r => r._2.toLong -> r._3).toMap
    val wantBands = h.values.groupBy(_ / 1000)
      .map { case (b, xs) => b -> xs.size.toLong }
    assert(bands === wantBands, "hub band histogram differs")
  }

  test("q332 per-flag digit masses sum to the row count and deviations " +
    "match the literal expectation") {
    val rows = SparkEntry.queries("q332_benford_audit")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.length === 27) // 3 flags x 9 digits
    val micro = Map(1L -> 301030L, 2L -> 176091L, 3L -> 124939L,
      4L -> 96910L, 5L -> 79181L, 6L -> 66947L, 7L -> 57992L,
      8L -> 51153L, 9L -> 45757L)
    rows.groupBy(_._1).foreach { case (flag, rs) =>
      val n = rs.map(_._3).sum
      rs.foreach { case (_, d, nObs, expM, obsM, devBp) =>
        assert(expM === n * micro(d), s"exp_micro at ($flag,$d)")
        assert(obsM === nObs * 1000000L)
        assert(devBp === math.abs(obsM - expM) * 10000L / expM)
      }
    }
    // prices are uniform-ish, so digit 1 must be visibly over- or
    // under-Benford somewhere (the audit has to detect SOMETHING)
    assert(rows.exists(_._6 > 500), "audit found no deviation at all")
  }

  test("q333 features never see the example row or anything at/after " +
    "its timestamp") {
    val got = SparkEntry.queries("q333_pit_feature_join")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    val evs = Tables.load(spark, dir, "events")
      .filter(col("event_id").isNotNull && col("user_id").isNotNull &&
        col("ts").isNotNull && col("event_type").isNotNull)
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts)").as("us"), col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), if (r.isNullAt(4)) 0L else r.getLong(4)))
    val purchases = evs.filter(_._4 == "purchase")
    assert(got.size === purchases.length)
    val byUser = evs.groupBy(_._2)
    purchases.foreach { case (id, u, us, _, _) =>
      val window = byUser(u).filter(e =>
        e._3 >= us - 7L * 24 * 3600 * 1000000 && e._3 <= us - 1)
      val views = window.filter(_._4 == "view")
      val want = (u, us, views.size.toLong,
        window.filter(_._4 == "click").map(_._5).sum,
        if (views.isEmpty) -1L else views.map(_._3).max,
        if (views.isEmpty) -1L else us - views.map(_._3).max)
      assert(got(id) === want, s"PIT features at purchase $id")
    }
  }
}
