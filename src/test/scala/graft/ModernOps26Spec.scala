package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q362 try_* semantics, q363 TTL retention, q364 RFM segments. */
class ModernOps26Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def cents(v: Double): Long =
    (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100)
      .toLong

  private def events = Tables.load(spark, dir, "events")

  test("q362 channels match a direct replay of the error predicates") {
    val rows = events
      .filter(col("event_id").isNotNull && col("value").isNotNull &&
        col("user_id").isNotNull && col("event_type").isNotNull)
      .select("value", "user_id").collect()
      .map(r => (cents(r.getDouble(0)), r.getLong(1)))
    val r = SparkEntry.queries("q362_try_arithmetic")(spark, dir).head()
    assert(r.getLong(0) === rows.length.toLong)
    assert(r.getLong(1) === rows.count(_._1 > 0).toLong)
    assert(r.getLong(2) === rows.filter(_._1 <= 0).map(_._1).sum)
    assert(r.getLong(3) === rows.count(_._2 % 7 == 0).toLong)
    assert(r.getLong(4) ===
      rows.filter(_._2 % 7 != 0).map(_._1).sum)
    assert(r.getLong(5) ===
      rows.count(x => x._2 % 3 == 0 || x._1 < 0).toLong)
    assert(r.getLong(6) ===
      rows.filter(x => x._2 % 3 != 0 && x._1 >= 0).map(_._1).sum)
  }

  test("q363 kept+purged partitions every policied event") {
    val policy = Map("view" -> 7, "click" -> 14, "purchase" -> 365,
      "signup" -> 365, "error" -> 3)
    val evs = events.filter(col("ts").isNotNull &&
      col("event_type").isNotNull)
      .select("event_type", "ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1)))
    val mx = evs.map(_._2.getTime).max
    val got = SparkEntry.queries("q363_ttl_retention")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    got.foreach { case (t, (ttl, kept, purged)) =>
      assert(ttl === policy(t).toLong)
      val cut = mx - ttl * 86400000L
      val (k, p) = evs.filter(_._1 == t)
        .partition(_._2.getTime >= cut)
      assert((kept, purged) === ((k.length.toLong, p.length.toLong)),
        s"at $t")
    }
    assert(got.keySet === policy.keySet)
  }

  test("q364 quintiles are balanced and segment mass conserves users") {
    val nUsers = events
      .filter(col("event_type") === "purchase" &&
        col("user_id").isNotNull && col("ts").isNotNull &&
        col("value").isNotNull)
      .select("user_id").distinct().count()
    val got = SparkEntry.queries("q364_rfm_segments")(spark, dir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)),
        r.getLong(3)))
    assert(got.map(_._2).sum === nUsers)
    got.foreach { case ((rr, f, m), _) =>
      assert(rr >= 1 && rr <= 5 && f >= 1 && f <= 5 && m >= 1 && m <= 5)
    }
    // each axis's marginal is an exact ntile allocation: bucket sizes
    // differ by at most one
    Seq[((Long, Long, Long)) => Long](_._1, _._2, _._3).foreach { ax =>
      val marginal = got.groupBy(x => ax(x._1)).view
        .mapValues(_.map(_._2).sum).values
      assert(marginal.max - marginal.min <= 1,
        s"unbalanced quintiles: ${marginal.toSeq.sorted}")
    }
  }
}
