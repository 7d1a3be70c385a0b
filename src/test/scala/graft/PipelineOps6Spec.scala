package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-8 pipeline operators, part 6 (q224-q229): independent
  * plain-Scala recomputations at sf0.001, plus the skyline's
  * brute-force dominance cross-check. */
class PipelineOps6Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def docTokens(): Array[(Long, Array[String])] =
    Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty)))
      .sortBy(_._1)

  // ------------------------------------------------------- q224

  test("q224 equals a sequential per-source packing replay") {
    val T = 60000L
    val files = Tables.load(spark, dir, "documents")
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = files.groupBy(_._1).toSeq.flatMap { case (src, fs) =>
      var cum = 0L
      fs.sortBy { case (_, id, n) => (-n, id) }
        .map { case (_, id, n) =>
          val bin = cum / T; cum += n; (src, bin, id, n)
        }
        .groupBy { case (_, bin, _, _) => bin }
        .map { case (bin, g) =>
          (src, bin, g.size.toLong, g.map(_._4).sum,
            g.map(_._3).min, g.map(_._3).max)
        }
    }.toSet
    val got = SparkEntry.queries("q224_compaction_plan")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got === expected)
    // Conservation: the plan partitions every file exactly once — per-
    // source byte and file totals match the source table exactly.
    val bySrc = files.groupBy(_._1)
    got.toSeq.groupBy(_._1).foreach { case (src, bins) =>
      assert(bins.map(_._4).sum === bySrc(src).map(_._3).sum,
        s"bytes lost: $src")
      assert(bins.map(_._3).sum === bySrc(src).length.toLong,
        s"files lost: $src")
    }
  }

  // ------------------------------------------------------- q225

  test("q225 equals a sequential bigram-LM replay") {
    val toks = docTokens()
    val c1 = toks.flatMap(_._2).groupBy(identity)
      .map { case (w, g) => (w, g.length.toLong) }
    val allBg = toks.flatMap { case (_, ws) =>
      ws.sliding(2).collect { case Array(a, b) => s"$a $b" }
    }
    val c2 = allBg.groupBy(identity).map { case (b, g) => (b, g.length.toLong) }
    val expected = toks.flatMap { case (id, ws) =>
      if (ws.length < 2) None
      else {
        val ppms = ws.sliding(2).collect { case Array(a, b) =>
          c2(s"$a $b") * 1000000L / c1(a)
        }.toSeq
        Some((id, (ppms.size.toLong, ppms.sum, ppms.sum / ppms.size)))
      }
    }.toMap
    val got = SparkEntry.queries("q225_bigram_lm_score")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === expected)
  }

  // ------------------------------------------------------- q226

  test("q226 equals the brute-force non-dominated set") {
    val pts = Tables.load(spark, dir, "part")
      .selectExpr("CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)",
        "CAST(p_size AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = pts.filter { case (p, sz) =>
      !pts.exists { case (p2, s2) =>
        p2 <= p && s2 >= sz && (p2 < p || s2 > sz)
      }
    }
    val got = SparkEntry.queries("q226_skyline")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
    // Frontier shape: strictly increasing size as price increases.
    val sorted = got.toSeq.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 < b._2, s"not a frontier: $a $b")
      case _ =>
    }
  }

  // ------------------------------------------------------- q227

  test("q227 returns exactly rows 41-60 of the total order") {
    val all = Tables.load(spark, dir, "orders")
      .selectExpr("o_orderkey",
        "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (k, c) => (-c, k) }
    val expected = all.slice(40, 60).toSeq
    val got = SparkEntry.queries("q227_offset_fetch")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      .sortBy { case (k, c) => (-c, k) }
    assert(got === expected)
  }

  // ------------------------------------------------------- q228

  test("q228 equals a sequential winsorization replay") {
    val rows = Tables.load(spark, dir, "orders")
      .selectExpr("o_orderpriority", "o_orderkey",
        "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = rows.groupBy(_._1).map { case (pri, g) =>
      val sorted = g.sortBy { case (_, k, c) => (c, k) }.map(_._3)
      val n = sorted.length.toLong
      val lo = sorted(((5 * n + 99) / 100 - 1).toInt)
      val hi = sorted(((95 * n + 99) / 100 - 1).toInt)
      val clamped = sorted.map(c => math.max(lo, math.min(hi, c)))
      (pri, (n, lo, hi, clamped.sum,
        sorted.count(c => c < lo || c > hi).toLong))
    }
    val got = SparkEntry.queries("q228_winsorized_stats")(spark, dir)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(got === expected)
  }

  // ------------------------------------------------------- q231

  /** Plain-Scala replay of the q53/q133/q231 rolling fingerprint. */
  private def fingerprint(text: String): Long = {
    val atoms = text.split(" ").filter(_.nonEmpty).take(20)
      .map(w => w.length.toLong * 31 + w.codePointAt(0))
    atoms.foldLeft(7L)((acc, x) => (acc * 1000003 + x) % 2147483647L)
  }

  test("q231 split equals the fingerprint-slot replay and is re-run stable") {
    val rows = Tables.load(spark, dir, "documents")
      .select("doc_id", "source", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val expected = rows.map { case (_, src, nc, text) =>
      val slot = fingerprint(text) % 100
      val split = if (slot < 80) "train" else if (slot < 90) "val" else "test"
      (src, split, nc)
    }.groupBy { case (src, split, _) => (src, split) }
      .map { case ((src, split), g) =>
        ((src, split), (g.size.toLong, g.map(_._3).sum)) }
    def run() = SparkEntry.queries("q231_train_split")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    val got = run()
    assert(got === expected)
    // Content-keyed split: a second run assigns identically.
    assert(run() === got)
    // All three splits materialize somewhere in the corpus.
    assert(got.keySet.map(_._2) === Set("train", "val", "test"))
  }

  // ------------------------------------------------------- q232

  test("q232 equals a sequential ntile replay (SQL floor/remainder rule)") {
    val rows = Tables.load(spark, dir, "events")
      .selectExpr("event_type", "event_id",
        "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = rows.groupBy(_._1).flatMap { case (t, g) =>
      val sorted = g.sortBy { case (_, id, c) => (c, id) }
      val n = sorted.length
      val base = n / 10; val rem = n % 10
      // SQL ntile: first `rem` buckets get base+1 rows, the rest base.
      val sizes = (1 to 10).map(b => if (b <= rem) base + 1 else base)
      val bounds = sizes.scanLeft(0)(_ + _)
      (1 to 10).filter(b => sizes(b - 1) > 0).map { b =>
        val slice = sorted.slice(bounds(b - 1), bounds(b)).map(_._3)
        ((t, b.toLong), (slice.length.toLong, slice.min, slice.max))
      }
    }
    val got = SparkEntry.queries("q232_ntile_binning")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === expected)
  }

  // ------------------------------------------------------- q233

  test("q233 recall equals a brute-force double-ranked replay") {
    val vecs = Tables.load(spark, dir, "embeddings")
      .selectExpr("vec_id", "label",
        "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Double](2).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val queries = vecs.filter(_._1 < 50)
    val expected = queries.map { case (qid, qlab, qv) =>
      def top3(cands: Array[(Long, Int, Array[Double])]) =
        cands.map { case (id, _, v) => (id, cos(qv, v)) }
          .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toSet
      val ex = top3(vecs.filter(_._1 != qid))
      val ann = top3(vecs.filter(c => c._1 != qid && c._2 == qlab))
      val hits = ex.intersect(ann).size.toLong
      (qid, (ex.size.toLong, hits, hits * 10000 / ex.size))
    }.toMap
    val got = SparkEntry.queries("q233_ann_recall")(spark, dir)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
    // The metric only means something if the fixture separates the
    // paths: some query must miss at least one exact neighbor.
    assert(got.values.exists(_._3 < 10000), "ANN trivially perfect")
  }

  // ------------------------------------------------------- q235

  test("q235 returns exactly the max-key order from the bucketed table") {
    val rows = Tables.load(spark, dir, "orders")
      .selectExpr("o_orderkey", "o_orderpriority",
        "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = Seq(rows.maxBy(_._1))
    val got = SparkEntry.queries("q235_bucket_pruning")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  // ------------------------------------------------------- q236

  test("q236 equals a per-day union-of-trailing-window replay") {
    val rows = Tables.load(spark, dir, "events")
      .selectExpr("unix_micros(ts) div 86400000000 AS day", "user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val days = rows.map(_._1)
    val expected = (days.min to days.max).map { d =>
      // distinct users active on any of the 7 days ending at d
      (d, rows.collect { case (ad, u) if ad >= d - 6 && ad <= d => u }
        .size.toLong)
    }.toMap
    val got = SparkEntry.queries("q236_rolling_dau")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === expected)
    // Windowing must actually widen: some rolling count exceeds that
    // day's own distinct actives.
    val daily = rows.groupBy(_._1).map { case (d, g) => (d, g.size.toLong) }
    assert(expected.exists { case (d, n) => n > daily.getOrElse(d, 0L) })
  }

  // ------------------------------------------------------- q241

  test("q241 equals a plain-Scala constraint evaluation") {
    val orders = Tables.load(spark, dir, "orders")
      .select("o_orderkey").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    val li = Tables.load(spark, dir, "lineitem")
      .selectExpr("l_orderkey", "CAST(l_quantity AS DECIMAL(12,2)) AS q")
      .collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getDecimal(1)))
    val ev = Tables.load(spark, dir, "events").select("value").collect()
      .map(r => r.isNullAt(0))
    val oKeys = orders.flatten.toSet
    val expected = Map(
      "orders.o_orderkey.not_null" ->
        (orders.length.toLong, orders.count(_.isEmpty).toLong),
      "orders.o_orderkey.unique" ->
        (orders.length.toLong, (orders.flatten.length - oKeys.size).toLong),
      "lineitem.l_quantity.range_1_50" ->
        (li.length.toLong, li.count { case (_, q) =>
          q.compareTo(java.math.BigDecimal.ONE) < 0 ||
            q.compareTo(new java.math.BigDecimal(50)) > 0 }.toLong),
      "lineitem.l_orderkey.ref_orders" ->
        (li.length.toLong,
          li.count(l => l._1.isDefined && !oKeys.contains(l._1.get)).toLong),
      "events.value.not_null" ->
        (ev.length.toLong, ev.count(identity).toLong))
    val got = SparkEntry.queries("q241_data_quality_suite")(spark, dir)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(got === expected)
  }

  // ------------------------------------------------------- q229

  test("q229 equals a vocabulary-membership replay") {
    val toks = docTokens()
    val vocab = toks.flatMap(_._2).groupBy(identity).toSeq
      .map { case (w, g) => (w, g.length.toLong) }
      .sortBy { case (w, n) => (-n, w) }.take(100).map(_._1).toSet
    val expected = toks.filter(_._2.nonEmpty).map { case (id, ws) =>
      val oov = ws.count(w => !vocab.contains(w)).toLong
      (id, (ws.length.toLong, oov, oov * 10000 / ws.length))
    }.toMap
    val got = SparkEntry.queries("q229_oov_rate")(spark, dir)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
  }
}
