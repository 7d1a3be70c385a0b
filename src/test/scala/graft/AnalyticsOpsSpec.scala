package graft

import org.scalatest.funsuite.AnyFunSuite

import java.time.{DayOfWeek, LocalDate, ZoneOffset}
import java.time.temporal.TemporalAdjusters

/** Analytics operators (q163-q166, q168-q169): independent plain-Scala
  * recomputations at sf0.001 so the DuckDB oracles aren't the only
  * line of defense. */
class AnalyticsOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf

  /** (event_id, epochMicros, user_id, event_type, value) */
  private lazy val events: Array[(Long, Long, Long, String, Double)] =
    Tables.load(spark, dir, "events")
      .selectExpr("event_id", "unix_micros(ts)", "user_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))

  private def toDate(micros: Long): LocalDate =
    java.time.Instant.ofEpochSecond(
      Math.floorDiv(micros, 1000000L)).atZone(ZoneOffset.UTC).toLocalDate

  private def weekOf(micros: Long): LocalDate =
    toDate(micros).`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))

  test("q163 cohort matrix equals a plain-Scala recomputation") {
    val cohort = events.groupBy(_._3).map { case (u, es) => u -> weekOf(es.map(_._2).min) }
    val expected = events
      .map(e => ((cohort(e._3), weekOf(e._2)), e._3)).distinct
      .groupBy(_._1).map { case (k, g) => k -> g.length.toLong }
    val got = SparkEntry.queries("q163_retention_cohorts")(spark, dir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val k = (r.getDate(0).toLocalDate, r.getDate(1).toLocalDate)
      assert(r.getLong(2) == expected(k), s"cohort cell $k")
    }
    // the matrix is lower-triangular: activity never precedes the cohort week
    got.foreach(r => assert(!r.getDate(1).toLocalDate.isBefore(r.getDate(0).toLocalDate)))
  }

  test("q164 funnel equals a per-user ordered fold (and discriminates)") {
    val WinMicros = 24L * 3600 * 1000000
    val byUser = events.groupBy(_._3)
    def stageTs(u: Long): (Option[Long], Option[Long], Option[Long]) = {
      val es = byUser(u)
      val t1 = es.filter(_._4 == "view").map(_._2).sorted.headOption
      val t2 = t1.flatMap(t => es.filter(e => e._4 == "click" && e._2 > t && e._2 <= t + WinMicros)
        .map(_._2).sorted.headOption)
      val t3 = t2.flatMap(t => es.filter(e => e._4 == "purchase" && e._2 > t && e._2 <= t + WinMicros)
        .map(_._2).sorted.headOption)
      (t1, t2, t3)
    }
    val stages = byUser.keys.toSeq.map(stageTs)
    val expected = Map(
      "1_view" -> stages.count(_._1.isDefined).toLong,
      "2_click" -> stages.count(_._2.isDefined).toLong,
      "3_purchase" -> stages.count(_._3.isDefined).toLong)
    val got = SparkEntry.queries("q164_funnel")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // ordered-with-window semantics must actually bite at this SF
    assert(got("2_click") < got("1_view"), "funnel stage 2 does not discriminate")
    assert(got("3_purchase") <= got("2_click"))
  }

  test("q165 gap-fill: continuous day spine, zeros for missing days") {
    val sparse = events.filter(e => e._4 == "purchase" && e._5 > 190)
      .groupBy(e => toDate(e._2))
    val cents = sparse.map { case (d, es) =>
      d -> es.map(e => BigDecimal(e._5).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .sum
    }
    val d0 = toDate(events.map(_._2).min)
    val d1 = toDate(events.map(_._2).max)
    val got = SparkEntry.queries("q165_gapfill_daily")(spark, dir).collect()
    val days = got.map(_.getDate(0).toLocalDate)
    assert(days.head == d0 && days.last == d1)
    days.sliding(2).foreach { case Array(a, b) => assert(b == a.plusDays(1), s"gap at $a") }
    got.foreach { r =>
      val d = r.getDate(0).toLocalDate
      assert(r.getLong(1) == sparse.get(d).map(_.length).getOrElse(0).toLong, s"count on $d")
      assert(r.getDouble(2) == cents.get(d).map(_.toDouble).getOrElse(0.0), s"value on $d")
    }
    assert(got.exists(_.getLong(1) == 0L), "fixture produced no zero-filled day")
  }

  test("q166 profile equals per-column recomputation") {
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice",
        "l_returnflag", "l_linestatus", "l_shipdate").collect()
    val got = SparkEntry.queries("q166_column_profile")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))))
      .toMap
    assert(got.size == 6)
    def colVals[T](i: Int): Seq[T] =
      li.toSeq.filterNot(_.isNullAt(i)).map(_.get(i).asInstanceOf[T])
    // exhaustive check on one column per kind
    val rf = colVals[String](3)
    assert(got("l_returnflag") ==
      ((li.length - rf.length).toLong, rf.distinct.length.toLong, rf.min, rf.max))
    val qty = colVals[Double](1)
    val (qn, qd, qmin, qmax) = got("l_quantity")
    assert(qn == (li.length - qty.length).toLong && qd == qty.distinct.length.toLong)
    assert(BigDecimal(qmin) == BigDecimal(qty.min).setScale(2))
    assert(BigDecimal(qmax) == BigDecimal(qty.max).setScale(2))
    val ok = colVals[Long](0)
    assert(got("l_orderkey")._2 == ok.distinct.length.toLong)
  }

  test("q181 map build/merge/explode roundtrips the daily counts") {
    val expected = events
      .map(e => (e._4, toDate(e._2))).groupBy(identity)
      .map { case (k, g) => k -> g.length.toLong * 2 }
    val got = SparkEntry.queries("q181_map_functions")(spark, dir).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("q182 from_json/to_json roundtrip equals a plain props parse") {
    val K = """\d+""".r
    val expected = events
      .map(e => e._4 -> K.findFirstIn("%s".format(eventProps(e._1))).map(_.toInt).getOrElse(0))
      .filter(_._2 > 50)
      .groupBy(_._1).map { case (t, g) => t -> ((g.length.toLong, g.map(_._2.toLong).sum)) }
    val got = SparkEntry.queries("q182_from_json_struct")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
  }

  test("q186 histogram bins, cumulative counts, and shares recompute exactly") {
    val bins = events.groupBy(e => math.floor(e._5 / 25.0).toLong)
    val total = events.length.toLong
    val got = SparkEntry.queries("q186_value_histogram")(spark, dir).collect()
    assert(got.length == bins.size)
    var cum = 0L
    got.sortBy(_.getLong(0)).foreach { r =>
      val b = r.getLong(0); val n = bins(b).length.toLong
      cum += n
      assert(r.getLong(1) == b * 25 && r.getLong(2) == n)
      assert(r.getLong(3) == cum, s"bin $b cumulative")
      assert(r.getDouble(4) == n.toDouble / total.toDouble)
    }
    assert(cum == total)
  }

  test("q187 collect_set emits the sorted distinct users per type") {
    val byType = events.groupBy(_._4)
    val got = SparkEntry.queries("q187_collect_set")(spark, dir).collect()
    got.foreach { r =>
      val users = byType(r.getString(0)).map(_._3).distinct.sorted
      assert(r.getLong(1) == users.length.toLong)
      assert(r.getString(2) == users.take(5).mkString(","))
    }
  }

  private lazy val eventProps: Map[Long, String] =
    Tables.load(spark, dir, "events").select("event_id", "props").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("q168 fuzzy match is exactly the in-band pairs with lev <= 4") {
    val names = Tables.load(spark, dir, "part")
      .select("p_name").distinct().collect().map(_.getString(0)).sorted
    val expected = (for {
      a <- names; b <- names
      if a < b && a.split(' ').last == b.split(' ').last && lev(a, b) <= 4
    } yield (a, b, lev(a, b).toLong)).toSet
    val got = SparkEntry.queries("q168_fuzzy_name_match")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty, "fixture produced no fuzzy pairs")
  }

  test("q173 sessions equal a per-user gap fold") {
    val Gap = 6L * 3600 * 1000000
    val expected = events.groupBy(_._3).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._1)).toList
      val seqs = sorted.scanLeft((0L, Long.MinValue)) { case ((seq, prev), e) =>
        (if (prev == Long.MinValue || e._2 - prev > Gap) seq + 1 else seq, e._2)
      }.tail.map(_._1)
      sorted.zip(seqs).groupBy(_._2).map { case (sq, g) =>
        (u, sq, g.map(_._1._2).min, g.map(_._1._2).max, g.length.toLong)
      }
    }.toSet
    val got = SparkEntry.queries("q173_sessionize_gaps")(spark, dir)
      .selectExpr("user_id", "session_seq", "unix_micros(session_start)",
        "unix_micros(session_end)", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected)
    assert(got.exists(_._5 > 1), "no multi-event session at this SF")
  }

  test("q174 SCD2 intervals tile each user's timeline with one open version") {
    val got = SparkEntry.queries("q174_scd2_dimension")(spark, dir)
      .selectExpr("user_id", "version_id", "unix_micros(valid_from)",
        "unix_micros(valid_to)", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
    val signups = events.filter(_._4 == "signup")
    assert(got.length == signups.length)
    got.groupBy(_._1).foreach { case (u, vs) =>
      val sorted = vs.sortBy(v => (v._3, v._2))
      // half-open intervals chain: valid_to == next valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4.contains(b._3), s"user $u interval gap")
        case _ =>
      }
      assert(sorted.init.forall(!_._5) && sorted.last._5 && sorted.last._4.isEmpty,
        s"user $u current-version flags")
      val expectedFroms = signups.filter(_._3 == u).map(_._2).sorted.toSeq
      assert(sorted.map(_._3).toSeq == expectedFroms, s"user $u version starts")
    }
  }

  test("q175 trailing-hour frame equals a per-user scan") {
    val Hour = 3600L * 1000000
    val byUser = events.groupBy(_._3)
    val got = SparkEntry.queries("q175_trailing_hour_frame")(spark, dir).collect()
    assert(got.length == events.length)
    val byId = events.map(e => e._1 -> e).toMap
    got.foreach { r =>
      val e = byId(r.getLong(0))
      // RANGE frame bounds are inclusive on both ends: [ts - 1h, ts]
      val in = byUser(e._3).filter(x => x._2 >= e._2 - Hour && x._2 <= e._2)
      assert(r.getLong(2) == in.length.toLong, s"event ${e._1} count")
      val expectedSum = in.map(x => BigDecimal(x._5).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      assert(r.getDouble(3) == expectedSum.toDouble, s"event ${e._1} sum")
    }
  }

  test("q169 salted join result is byte-identical to the unsalted join") {
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_partkey", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val brandOf = Tables.load(spark, dir, "part")
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = li.flatMap { case (pk, price) => brandOf.get(pk).map(_ -> price) }
      .groupBy(_._1).map { case (b, g) =>
        b -> ((g.length.toLong,
          g.map(x => BigDecimal(x._2).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble))
      }
    val got = SparkEntry.queries("q169_salted_skew_join")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == expected)
  }

  test("q192 pagerank equals a plain-Scala integer power iteration") {
    val pairs = Tables.load(spark, dir, "lineitem")
      .select("l_partkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges: Array[(String, String)] =
      pairs.map { case (p, s) => (s"P$p", s"S$s") } ++
        pairs.map { case (p, s) => (s"S$s", s"P$p") }
    val deg: Map[String, Long] =
      edges.groupBy(_._1).map { case (n, g) => n -> g.length.toLong }
    var r: Map[String, Long] = deg.map { case (n, _) => n -> 1000000000000L }
    for (_ <- 1 to 3) {
      val contrib = edges.map { case (src, dst) => dst -> r(src) / deg(src) }
      r = contrib.groupBy(_._1).map { case (n, g) =>
        n -> (150000000000L + (85L * g.map(_._2).sum) / 100L)
      }
    }
    val expected = r.toSeq.sortBy { case (n, v) => (-v, n) }.take(20)
    val got = SparkEntry.queries("q192_pagerank")(spark, dir).collect()
      .map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(got == expected)
    // discriminative: the top-20 must contain distinct rank values
    assert(expected.map(_._2).distinct.length > 1)
  }

  test("q196 time-weighted integration equals a per-user sequential fold") {
    val expected = events.groupBy(_._3).collect {
      case (u, evs) if evs.length >= 2 =>
        // sort by (us, event_id) as the window does; fold consecutive pairs
        val sorted = evs.sortBy(e => (e._2, e._1))
        val cents = sorted.map(e =>
          BigDecimal(e._5).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        val segs = sorted.zip(sorted.tail).zipWithIndex.map { case (((_, us1, _, _, _), (_, us2, _, _, _)), i) =>
          (us2 - us1, (cents(i) + cents(i + 1)) * BigDecimal(us2 - us1))
        }
        u -> ((segs.length.toLong, segs.map(_._1).sum,
          segs.map(_._2).sum.setScale(2).toString))
    }
    // weighted_sum is emitted as a fixed-scale-2 decimal STRING (the
    // q01 magnitude-proof pattern); compare the canonical rendering.
    val got = SparkEntry.queries("q196_time_weighted")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (u, e) => assert(got(u) == e, s"user $u") }
  }

  test("q199 rolling anomaly flags equal a sequential integer-window fold") {
    val expected = events.groupBy(_._3).toSeq.flatMap { case (u, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._1))
      val cents = sorted.map(e =>
        (BigDecimal(e._5).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact)
      sorted.indices.collect {
        case i if i >= 24 =>
          val w = cents.slice(i - 24, i + 1)
          val s1 = w.sum; val s2 = w.map(c => c * c).sum
          val dev = 25L * cents(i) - s1
          (u, sorted(i)._1, cents(i), dev * dev > 9L * (25L * s2 - s1 * s1))
      }.collect { case (uu, eid, c, true) => (uu, eid, c) }
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("q199_rolling_anomaly")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(got.nonEmpty, "fixture must actually contain 3-sigma outliers")
  }

  test("q201 hierarchy totals reconcile bottom-up exactly") {
    val rows = SparkEntry.queries("q201_share_hierarchy")(spark, dir).collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getAs[Number](1).longValue(),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    // nation cents recomputed from raw suppliers
    val sup = Tables.load(spark, dir, "supplier")
      .select("s_nationkey", "s_acctbal").collect()
      .map(r => (r.getAs[Number](0).longValue(),
        (BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact))
    val byNation = sup.groupBy(_._1).map { case (n, g) => n -> g.map(_._2).sum }
    rows.foreach { case (_, nk, nc, _, _) => assert(nc == byNation(nk), s"nation $nk") }
    // region totals = sum of their nations; global = sum of all
    rows.groupBy(_._1).foreach { case (rk, g) =>
      val regionSum = g.map(_._3).sum
      g.foreach { case (_, _, _, rc, _) => assert(rc == regionSum, s"region $rk") }
    }
    val globalSum = rows.map(_._3).sum
    rows.foreach { case (_, _, _, _, gc) => assert(gc == globalSum) }
  }
}
