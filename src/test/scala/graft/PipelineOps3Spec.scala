package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-5 pipeline operators, part 3 (q161/q162/q167) plus the q170
  * streaming restart: plain-Scala recomputations at sf0.001. */
class PipelineOps3Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf

  private lazy val docs: Array[(Long, String)] =
    Tables.load(spark, dir, "documents").select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

  test("q161 boilerplate strip equals a plain segment-DF recomputation") {
    val segsOf: Map[Long, Seq[String]] = docs.map { case (id, text) =>
      id -> text.split(" ", -1).grouped(10).map(_.mkString(" ")).toSeq
    }.toMap
    val segDf = segsOf.toSeq.flatMap { case (id, ss) => ss.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (s, g) => s -> g.length }
    val got = SparkEntry.queries("q161_boilerplate_strip")(spark, dir).collect()
    assert(got.length == docs.length)
    got.foreach { r =>
      val (id, total, kept, clean) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      val ss = segsOf(id)
      val keptSegs = ss.filter(s => segDf(s) < 2)
      assert(total == ss.length.toLong, s"doc $id total")
      assert(kept == keptSegs.length.toLong, s"doc $id kept")
      assert(clean == keptSegs.mkString(" "), s"doc $id text")
    }
    // the gate must actually strip something at this SF
    assert(got.exists(r => r.getLong(2) < r.getLong(1)), "nothing stripped")
  }

  test("q162 dup flags equal the exact corpus-key lookup (bloom is only a prefilter)") {
    def key(text: String) = text.split(" ", -1).take(5).mkString(" ")
    val corpusKeys = docs.filter(_._1 % 10 < 8).map(d => key(d._2)).toSet
    val batch = docs.filter(_._1 % 10 >= 8).sortBy(_._1)
    val got = SparkEntry.queries("q162_bloom_incremental_dedup")(spark, dir).collect()
    assert(got.length == batch.length)
    got.zip(batch).foreach { case (r, (id, text)) =>
      assert(r.getLong(0) == id)
      assert(r.getString(1) == key(text))
      assert(r.getBoolean(2) == corpusKeys.contains(key(text)), s"doc $id is_dup")
    }
  }

  private def zval(x: Long, y: Long): Long =
    (0 until 8).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("q167 manifest equals recomputation; buckets are aligned 32x32 tiles") {
    val pts = Tables.load(spark, dir, "lineitem")
      .select("l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0) % 256, r.getLong(1) % 256))
    val byBucket = pts.groupBy { case (x, y) => zval(x, y) / 1024 }
    val got = SparkEntry.queries("q167_zorder_manifest")(spark, dir).collect()
    assert(got.length == byBucket.size)
    got.foreach { r =>
      val b = r.getLong(0); val g = byBucket(b)
      assert(r.getLong(1) == g.length.toLong)
      assert(r.getLong(2) == g.map(_._1).min && r.getLong(3) == g.map(_._1).max)
      assert(r.getLong(4) == g.map(_._2).min && r.getLong(5) == g.map(_._2).max)
      val prunable = r.getLong(3) < 32 || r.getLong(2) > 47 ||
        r.getLong(5) < 96 || r.getLong(4) > 111
      assert(r.getBoolean(6) == prunable)
    }
    // The geometric guarantee that makes z-order prunable in BOTH
    // dimensions: a z-prefix bucket (z div 1024 fixes the top 3 bits of
    // x AND y) is an axis-aligned 32x32 tile, so every bucket envelope
    // is bounded in x and y simultaneously — a 1-D sort bounds only its
    // sort column. Hence at most 4 tiles can touch the 16x16 probe box.
    byBucket.foreach { case (b, g) =>
      val (xs, ys) = (g.map(_._1), g.map(_._2))
      assert(xs.min / 32 == xs.max / 32, s"bucket $b x-envelope crosses a tile")
      assert(ys.min / 32 == ys.max / 32, s"bucket $b y-envelope crosses a tile")
    }
    val nonPrunable = byBucket.values.count { g =>
      !(g.map(_._1).max < 32 || g.map(_._1).min > 47 ||
        g.map(_._2).max < 96 || g.map(_._2).min > 111)
    }
    assert(nonPrunable <= 4, s"probe box touches $nonPrunable buckets, tile bound is 4")
    assert(nonPrunable < byBucket.size, "no bucket pruned at all")
  }

  test("q177 source divergence equals an integer-exact plain recomputation") {
    val srcDocs = Tables.load(spark, dir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val toks = srcDocs.flatMap { case (s, t) => t.split(" ", -1).map(s -> _) }
    val g = toks.groupBy(_._2).map { case (w, xs) => w -> xs.length.toLong }
    val t = toks.length.toLong
    val expected = toks.groupBy(_._1).map { case (src, xs) =>
      val ts = xs.length.toLong
      val cs = xs.groupBy(_._2).map { case (w, ys) => w -> ys.length.toLong }
      val nm = g.map { case (w, c) => math.abs(cs.getOrElse(w, 0L) * t - c * ts) }.sum
      src -> ((ts, nm.toDouble / (2L * t * ts).toDouble))
    }
    val got = SparkEntry.queries("q177_source_divergence")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == expected)
    assert(got.values.exists(_._2 > 0.0), "all sources identical to the corpus?")
  }

  test("q178 grouped top-k equals a per-group sort-take") {
    val orders = Tables.load(spark, dir, "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = orders.groupBy(_._1).toSeq.flatMap { case (ck, os) =>
      os.sortBy(o => (-o._3, o._2)).take(3).zipWithIndex
        .map { case (o, i) => (ck, i + 1, o._2, o._3) }
    }.toSet
    val got = SparkEntry.queries("q178_grouped_topk")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expected)
    assert(got.exists(_._2 == 3), "no group reached k=3 at this SF")
  }

  test("q179 incremental refresh equals the full recompute, and the MV stores only pre-cutoff days") {
    val full = Tables.load(spark, dir, "events")
      .selectExpr("CAST(ts AS DATE) AS day", "event_type", "value").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getString(1), r.getDouble(2)))
    val expected = full.groupBy(e => (e._1, e._2)).map { case (k, g) =>
      k -> ((g.length.toLong,
        g.map(e => BigDecimal(e._3).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble))
    }
    val got = SparkEntry.queries("q179_incremental_mv_refresh")(spark, dir).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == expected)
    // the materialized base really is partial: only days <= cutoff
    val cutoff = full.map(_._1).min.plusDays(24)
    val mv = spark.read.parquet(s"/tmp/graft_mv_${math.abs(dir.hashCode)}")
    val mvDays = mv.select("day").collect().map(_.getDate(0).toLocalDate)
    assert(mvDays.max == cutoff && full.map(_._1).max.isAfter(cutoff),
      "MV/delta split degenerate — cutoff outside the data range")
  }

  test("q185 deterministic k-sample equals the LCG-priority sort and is stable") {
    val byPriority = Tables.load(spark, dir, "documents")
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (src, ds) =>
        src -> ds.map(_._2)
          .sortBy(id => ((id * 1103515245L + 12345L) % 2147483647L, id))
          .take(5).toSeq
      }
    def run() = SparkEntry.queries("q185_grouped_ksample")(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val got = run()
    got.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.sortBy(_._2).map(_._3).toSeq == byPriority(src), s"source $src")
    }
    assert(got.toSeq == run().toSeq, "sample not stable across runs")
  }

  test("q170 restart processes every event exactly once (no dup event_ids in the sink)") {
    val res = SparkEntry.queries("q170_stream_restart_exactly_once")(spark, dir).collect()
    assert(res.map(_.getLong(1)).sum ==
      Tables.load(spark, dir, "events").count())
    val sink = s"/tmp/graft_q170_${math.abs(dir.hashCode)}/sink"
    val ids = spark.read.parquet(sink).select("event_id")
    assert(ids.count() == ids.distinct().count(), "sink contains reprocessed rows")
  }

  test("q189 drops exactly the late day: counts are on-time-only, once per window") {
    import org.apache.spark.sql.functions._
    import java.time.temporal.ChronoUnit
    val got = SparkEntry.queries("q189_stream_late_data")(spark, dir).collect()
    val ev = Tables.load(spark, dir, "events")
    val bounds = ev.agg(min("ts"), max("ts")).first()
    val cut = java.sql.Timestamp.from(
      bounds.getTimestamp(0).toInstant.truncatedTo(ChronoUnit.HOURS)
        .plus(24, ChronoUnit.HOURS))
    val late = ev.filter(col("ts") < lit(cut)).count()
    val onTime = ev.filter(col("ts") >= lit(cut)).count()
    assert(late > 0, "fixture must actually contain late rows")
    // every on-time row counted exactly once, every late row absent
    assert(got.map(_.getLong(1)).sum == onTime)
    // one emission per window (append-mode finalization is exactly-once)
    assert(got.map(_.getLong(0)).distinct.length == got.length)
    // window set == distinct on-time hours (no late-only window leaked in)
    val hours = ev.filter(col("ts") >= lit(cut))
      .select(unix_micros(date_trunc("hour", col("ts"))).as("h"))
      .distinct().collect().map(_.getLong(0)).sorted
    assert(got.map(_.getLong(0)).sorted.sameElements(hours))
  }

  test("q190 stream outer join equals a brute-force batch left join") {
    import org.apache.spark.sql.functions._
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val views = ev.filter(_._2 == "view")
    val purchases = ev.filter(_._2 == "purchase")
    val byUser = purchases.groupBy(_._1)
    val hourUs = 3600L * 1000000L
    val expected = views.groupBy(_._1).map { case (u, vs) =>
      val ps = byUser.getOrElse(u, Array.empty).map(_._3)
      var matched = 0L; var unmatched = 0L
      vs.foreach { case (_, _, vus) =>
        val n = ps.count(p => p >= vus && p <= vus + hourUs)
        if (n == 0) unmatched += 1 else matched += n
      }
      u -> ((matched, unmatched))
    }
    val got = SparkEntry.queries("q190_stream_outer_join")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (u, e) => assert(got(u) == e, s"user $u") }
    // the outer semantics must actually be exercised: some user has an
    // unmatched view AND some user has a match
    assert(expected.values.exists(_._2 > 0))
    assert(expected.values.exists(_._1 > 0))
  }

  test("q191 heavy hitters equal the exact token-frequency filter") {
    val toks = docs.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
    val counts = toks.groupBy(identity).map { case (t, g) => t -> g.length.toLong }
    val n = toks.length.toLong
    val expected = counts.filter { case (_, c) => c * 10000L > n * 335L }
    val got = SparkEntry.queries("q191_heavy_hitters")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // discriminative on the fixture: a strict subset of the vocabulary
    assert(expected.nonEmpty && expected.size < counts.size)
  }

  test("q195 source overlap equals a plain-Scala membership recomputation") {
    val rows = Tables.load(spark, dir, "documents")
      .select("text", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = rows
      .map { case (text, src) =>
        (text.split(" ", -1).take(5).mkString(" "), src) }
      .distinct
      .groupBy(_._1).map { case (_, g) => g.map(_._2).distinct.sorted.mkString(",") }
      .groupBy(identity).map { case (m, g) => m -> g.size.toLong }
    val got = SparkEntry.queries("q195_source_overlap")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // overlap must actually exist in the fixture (multi-source memberships)
    assert(expected.keys.exists(_.contains(",")))
  }

  test("q191 Misra-Gries summary: bounded size, heavy keys always survive eviction") {
    // skewed synthetic stream, cardinality >> k, interleaved so the
    // decrement-all eviction path runs many times
    val k = 10
    val heavy = Seq.fill(500)("HH")
    val noise = (1 to 3000).map(i => s"u$i")
    val stream = (heavy ++ noise).sortBy(_.hashCode) // deterministic interleave
    val summary = graft.operators.PipelineOps3.misraGries(stream.iterator, k).toSet
    assert(summary.size <= k, "summary must never exceed k counters")
    // guarantee: count(HH)=500 > n/k = 3500/10 -> HH must survive
    assert(summary.contains("HH"))
    // eviction actually happened (cardinality 3001 > k)
    assert(summary.size < 3001)
  }
}
