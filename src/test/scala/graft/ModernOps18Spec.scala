package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q342 encoding advisor, q343 time-bounded conversion, q344 quantile
  * normalization. */
class ModernOps18Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q342 verdicts follow the thresholds and stats are exact") {
    val rows = SparkEntry.queries("q342_encoding_advisor")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5)))
    assert(rows.map(_._1).toSet ===
      Set("l_returnflag", "l_linestatus", "l_partkey", "l_quantity"))
    rows.foreach { case (c, n, ndv, simpson, topBp, verdict) =>
      assert(ndv > 0 && n >= ndv && simpson >= n,
        s"stat sanity at $c") // simpson >= n with equality iff all-distinct
      val want = if (ndv * 100 <= n) "dict"
        else if (topBp >= 5000) "rle" else "plain"
      assert(verdict === want, s"verdict at $c")
    }
    // the low-cardinality flags must be dict-able, the key must not
    assert(rows.find(_._1 == "l_returnflag").get._6 === "dict")
    assert(rows.find(_._1 == "l_partkey").get._6 === "plain")
  }

  test("q343 conversions match a per-view replay") {
    val rows = SparkEntry.queries("q343_time_bounded_conversion")(
      spark, dir).collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2)))
      .toMap
    val evs = Tables.load(spark, dir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"),
        to_date(col("ts")).cast("string").as("day"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3)))
    val byUser = evs.groupBy(_._1)
    val views = evs.filter(_._2 == "view")
    val want = views.groupBy(_._4).map { case (day, vs) =>
      val conv = vs.count { v =>
        byUser(v._1).exists(e => e._2 == "purchase" &&
          e._3 >= v._3 + 1 && e._3 <= v._3 + 30L * 60 * 1000000)
      }
      day -> (vs.size.toLong, conv.toLong)
    }
    assert(rows === want, "per-day conversion replay differs")
    assert(rows.valuesIterator.exists(_._2 > 0), "no conversions found")
  }

  test("q344 preserves within-group order and aligns marginals") {
    val rows = SparkEntry.queries("q344_quantile_normalization")(
      spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // monotone within group: higher grp_rank never gets a smaller
    // normalized value
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      rs.sortBy(_._4).sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5 <= b._5, s"normalization not monotone in $lang")
        case _ =>
      }
    }
    // the largest member of every group maps to the pooled maximum
    val pooledMax = rows.map(_._3).max
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      assert(rs.maxBy(_._4)._5 === pooledMax,
        s"top of $lang must map to the pooled max")
    }
  }
}
