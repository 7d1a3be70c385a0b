package graft

import org.scalatest.funsuite.AnyFunSuite

/** q207: the Spark-4 transformWithState surface. The gate checks the
  * single-batch parquet run against the batch oracle; this spec proves
  * the parts the gate can't see — state carried ACROSS micro-batches,
  * and the cents rounding contract on negative ties. */
class StreamingOps2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("cents matches CAST(double AS DECIMAL(12,2)) on negative .xx5 ties") {
    import graft.streaming.StreamingOps2.cents
    assert(cents(0.125) === 13L) // half-up, away from zero
    assert(cents(-0.125) === -13L) // math.round would give -12
    assert(cents(12.34) === 1234L)
    assert(cents(-0.005) === -1L)
    // agree with Spark's own cast on the same values
    import spark.implicits._
    val viaCast = Seq(0.125, -0.125, 12.34, -0.005).toDF("v")
      .selectExpr("CAST(CAST(v AS DECIMAL(12,2)) * 100 AS BIGINT)")
      .collect().map(_.getLong(0))
    assert(viaCast.toSeq === Seq(13L, -13L, 1234L, -1L))
  }

  test("q207 state survives across micro-batches (two-batch MemoryStream run)") {
    val s = spark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import s.implicits._
    val savedProvider = s.conf.get(
      "spark.sql.streaming.stateStore.providerClass", "")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = s.sqlContext
      val input = MemoryStream[(Long, Double)]
      val out = input.toDS()
        .groupByKey(_._1)
        .transformWithState(
          new graft.streaming.StreamingOps2.SpendProcessor,
          TimeMode.None(), OutputMode.Update())
      val query = out.writeStream.format("memory")
        .queryName("graft_q207_spec_sink").outputMode("update").start()
      try {
        input.addData((1L, 1.00), (1L, 2.00), (2L, 5.00))
        query.processAllAvailable()
        input.addData((1L, 0.50), (3L, 7.00))
        query.processAllAvailable()
      } finally query.stop()
      val rows = s.table("graft_q207_spec_sink")
        .toDF("user_id", "n", "cents").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // batch 1 emissions + batch 2 emissions with batch-1 state folded in
      assert(rows === Set(
        (1L, 2L, 300L), (2L, 1L, 500L), // after batch 1
        (1L, 3L, 350L), (3L, 1L, 700L))) // after batch 2: user 1 resumes
    } finally {
      if (savedProvider.nonEmpty)
        s.conf.set("spark.sql.streaming.stateStore.providerClass", savedProvider)
      else s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("q230 equals a brute-force batch full-outer replay (both null sides exercised)") {
    val dir = "/root/testdata/sf0.001"
    val HourUs = 3600000000L
    val evs = Tables.load(spark, dir, "events")
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS us")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val views = evs.filter(_._2 == "view").map(e => (e._1, e._3))
    val purch = evs.filter(_._2 == "purchase").map(e => (e._1, e._3))
    val users = (views.map(_._1) ++ purch.map(_._1)).distinct
    val expected = users.map { u =>
      val vs = views.filter(_._1 == u).map(_._2)
      val ps = purch.filter(_._1 == u).map(_._2)
      val matched = (for (v <- vs; p <- ps if p >= v && p <= v + HourUs)
        yield 1).size.toLong
      val vUn = vs.count(v => !ps.exists(p => p >= v && p <= v + HourUs)).toLong
      val pUn = ps.count(p => !vs.exists(v => p >= v && p <= v + HourUs)).toLong
      (u, (matched, vUn, pUn))
    }.filter { case (_, (m, vu, pu)) => m + vu + pu > 0 }.toMap
    val got = SparkEntry.queries("q230_stream_full_outer_join")(spark, dir)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
    // The full-outer contract is only exercised if BOTH null sides
    // actually appear in the corpus.
    assert(got.values.exists(_._2 > 0), "no unmatched views in fixture")
    assert(got.values.exists(_._3 > 0), "no unmatched purchases in fixture")
  }

  test("q259 equals a brute-force semi-join replay (matched views counted once)") {
    // sf0.01, not sf0.001: the smaller fixture has no view with TWO
    // matching purchases, and without one this replay can't tell semi
    // from inner (asserted below).
    val dir = "/root/testdata/sf0.01"
    val HourUs = 3600000000L
    val evs = Tables.load(spark, dir, "events")
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS us")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val views = evs.filter(_._2 == "view").map(e => (e._1, e._3))
    val purch = evs.filter(_._2 == "purchase").map(e => (e._1, e._3))
    val expected = views.groupBy(_._1).flatMap { case (u, vs) =>
      val ps = purch.filter(_._1 == u).map(_._2)
      // semi: each view row counts AT MOST once, however many matches
      val n = vs.count { case (_, v) => ps.exists(p => p >= v && p <= v + HourUs) }
      if (n > 0) Some(u -> n.toLong) else None
    }
    val got = SparkEntry.queries("q259_stream_semi_join")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    // the semi-vs-inner distinction is only exercised if some view has
    // MULTIPLE matching purchases (inner would double-count it)
    val multi = views.exists { case (u, v) =>
      purch.count(p => p._1 == u && p._2 >= v && p._2 <= v + HourUs) > 1 }
    assert(multi, "fixture has no multi-match view; semi == inner here")
  }

  test("q263 equals a batch join-then-window replay") {
    val dir = "/root/testdata/sf0.001"
    val HourUs = 3600000000L
    val DayUs = 86400000000L
    val evs = Tables.load(spark, dir, "events")
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS us",
        "CAST(ROUND(value * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val views = evs.filter(_._2 == "view")
    val purch = evs.filter(_._2 == "purchase")
    val pairs = for {
      v <- views; p <- purch
      if p._1 == v._1 && p._3 >= v._3 && p._3 <= v._3 + HourUs
    } yield ((v._3 / DayUs) * DayUs, p._4)
    val expected = pairs.groupBy(_._1).map { case (d, g) =>
      d -> (g.length.toLong, g.map(_._2).sum)
    }
    val got = SparkEntry.queries("q263_stream_join_then_window")(spark, dir)
      .selectExpr("unix_micros(CAST(day AS TIMESTAMP)) AS day_us", "n_pairs",
        "CAST(ROUND(purchase_value * 100) AS BIGINT) AS cents")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expected)
  }

  test("q266 equals a sequential gap-session replay incl. timer-flushed finals") {
    val dir = "/root/testdata/sf0.001"
    val GapUs = 30L * 60 * 1000000
    val evs = Tables.load(spark, dir, "events")
      .selectExpr("user_id", "unix_micros(ts) AS us").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = evs.groupBy(_._1).toSeq.flatMap { case (u, g) =>
      val ts = g.map(_._2).sorted
      val sessions = Seq.newBuilder[(Long, Long, Long, Long)]
      var st = ts.head; var last = ts.head; var n = 1L
      ts.tail.foreach { t =>
        if (t - last < GapUs) { last = t; n += 1 }
        else { sessions += ((u, st, last, n)); st = t; last = t; n = 1 }
      }
      sessions += ((u, st, last, n))
      sessions.result()
    }.toSet
    val got = SparkEntry.queries("q266_flatmap_sessionize")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expected)
    // timers matter only if some user's LAST session is multi-session
    assert(expected.groupBy(_._1).exists(_._2.size > 1),
      "every user has one session; inline emission alone would pass")
  }

  test("q234 streaming sessions equal a sequential gaps-and-islands replay") {
    val dir = "/root/testdata/sf0.001"
    val GapUs = 1800000000L
    val evs = Tables.load(spark, dir, "events")
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = evs.groupBy(_._1).toSeq.flatMap { case (u, g) =>
      val ts = g.sortBy(e => (e._3, e._2)).map(_._3)
      val sessions = Seq.newBuilder[(Long, Long, Long, Long)]
      var start = ts.head; var last = ts.head; var n = 1L
      ts.tail.foreach { t =>
        if (t - last >= GapUs) {
          sessions += ((u, start, last + GapUs, n)); start = t; n = 0L
        }
        last = t; n += 1
      }
      sessions += ((u, start, last + GapUs, n))
      sessions.result()
    }.toSet
    val got = SparkEntry.queries("q234_stream_session_window")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === expected)
    // Multi-event sessions must exist or the merge semantics went untested.
    assert(got.exists(_._4 > 1), "no multi-event session in fixture")
  }

  test("q221 within-watermark dedup drops a jittered duplicate that q117-style exact dedup keeps") {
    val s = spark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    // (event_id, ts_seconds, event_type): batch 2 replays event 1 with a
    // +1s jittered timestamp — same id, DIFFERENT event time.
    val input = MemoryStream[(Long, Long, String)]
    val stream = input.toDF().toDF("event_id", "sec", "event_type")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    val query = stream.writeStream.format("memory")
      .queryName("graft_q221_spec_sink").outputMode("complete").start()
    try {
      input.addData((1L, 1000L, "a"), (2L, 1001L, "b"))
      query.processAllAvailable()
      input.addData((1L, 1001L, "a"), (3L, 1002L, "b")) // jittered replay of id 1
      query.processAllAvailable()
    } finally query.stop()
    val got = s.table("graft_q221_spec_sink").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // id 1's replay is dropped despite the changed timestamp; exact
    // (id, ts) dedup — the q117 contract — would have kept it.
    assert(got === Map("a" -> 1L, "b" -> 2L))
  }
}
