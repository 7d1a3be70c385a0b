package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-8 pipeline operators, part 5 (q208-q217): independent
  * plain-Scala recomputations at sf0.001, plus MortonCode expression
  * properties. */
class PipelineOps5Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def docTokens(): Array[(Long, Array[String])] =
    Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty)))
      .sortBy(_._1)

  // ------------------------------------------------------- q208

  test("q208 equals a sequential integer-BM25 replay") {
    val queries = Seq(
      (1L, "hash"), (1L, "join"),
      (2L, "scan"), (2L, "filter"), (2L, "column"),
      (3L, "stream"), (3L, "window"))
    val toks = docTokens()
    val n = Tables.load(spark, dir, "documents").count()
    val tf = toks.flatMap { case (id, ws) =>
      ws.groupBy(identity).map { case (w, g) => ((id, w), g.length.toLong) }
    }.toMap
    val df = queries.map(_._2).distinct.map { t =>
      t -> toks.count(_._2.contains(t)).toLong
    }.toMap
    val expected = queries.groupBy(_._1).toSeq.flatMap { case (qid, terms) =>
      val scores = toks.flatMap { case (id, _) =>
        val s = terms.map { case (_, t) =>
          val f = tf.getOrElse((id, t), 0L)
          if (f == 0) 0L
          else ((2 * (n - df(t)) + 1) * 1000000L / (2 * df(t) + 1)) * f / (f + 2)
        }.sum
        if (s > 0) Some((id, s)) else None
      }
      scores.sortBy { case (id, s) => (-s, id) }.take(10).zipWithIndex
        .map { case ((id, s), i) => (qid, id, s, i + 1L) }
    }.toSet
    val got = SparkEntry.queries("q208_bm25_retrieval")(spark, dir)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expected)
  }

  // ------------------------------------------------------- q210

  test("q210 equals a per-codepoint histogram replay") {
    val texts = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = texts.filter(_._2.nonEmpty).map { case (id, s) =>
      val cps = s.codePoints().toArray
        .map(cp => new String(Character.toChars(cp)))
      val hist = cps.groupBy(identity).map { case (c, g) => (c, g.length.toLong) }
      val (topC, topN) = hist.toSeq.minBy { case (c, m) => (-m, c) }
      val nChars = cps.length.toLong
      val dom = topN * 10000 / nChars
      (id, (nChars, hist.size.toLong, topC, topN, dom, dom >= 2000))
    }.toMap
    val got = SparkEntry.queries("q210_char_diversity")(spark, dir)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4),
          r.getLong(5), r.getBoolean(6)))).toMap
    assert(got === expected)
  }

  // ------------------------------------------------------- q211

  test("q211 picks exactly the docs whose token span covers a stride multiple") {
    val S = 500
    val bySrc = Tables.load(spark, dir, "documents")
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).split(" ").count(_.nonEmpty).toLong))
      .filter(_._3 > 0).groupBy(_._1)
    val expected = bySrc.toSeq.flatMap { case (src, ds) =>
      var cum = 0L
      ds.sortBy(_._2).flatMap { case (_, id, tok) =>
        val prev = cum; cum += tok
        if (cum / S > prev / S) Some((src, id, tok, cum, cum / S)) else None
      }
    }.toSet
    val got = SparkEntry.queries("q211_token_budget_sample")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === expected)
    // Selection rate tracks the token mass: picked count == total/S +- 1
    // per source (systematic sampling guarantee).
    bySrc.foreach { case (src, ds) =>
      val total = ds.map(_._3).sum
      val picked = expected.count(_._1 == src)
      assert(math.abs(picked - total / S) <= 1, s"source $src")
    }
  }

  // ------------------------------------------------------- q213

  test("q213 equals a sequential per-user transition replay") {
    val rows = Tables.load(spark, dir, "events")
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts) AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = rows.groupBy(_._1).values.flatMap { evs =>
      evs.sortBy(e => (e._4, e._2)).sliding(2).collect {
        case Array(a, b) if b._4 - a._4 <= 1800000000L => (a._3, b._3)
      }
    }.toSeq.groupBy(identity).map { case (k, g) => (k, g.size.toLong) }
    val got = SparkEntry.queries("q213_session_transitions")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got === expected)
  }

  // ------------------------------------------------------- q214

  test("q214 equals a BigInt closed-form slope replay") {
    val rows = Tables.load(spark, dir, "events")
      .selectExpr("event_type", "unix_micros(ts) div 86400000000 AS day",
        "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS yc")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = rows.groupBy(_._1).map { case (t, g) =>
      val x0 = g.map(_._2).min
      val xs = g.map(e => BigInt(e._2 - x0))
      val ys = g.map(e => BigInt(e._3))
      val n = BigInt(g.length)
      val (sx, sy) = (xs.sum, ys.sum)
      val sxx = xs.map(v => v * v).sum
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val slope =
        if (den == 0) None
        else if (num >= 0) Some((num * 10000 / den).toLong)
        else Some(-((-num * 10000) / den).toLong)
      t -> (g.length.toLong, xs.distinct.length.toLong, ys.sum.toLong, slope)
    }
    val got = SparkEntry.queries("q214_linear_trend")(spark, dir)
      .collect().map { r =>
        val slope = if (r.isNullAt(4)) None else Some(r.getLong(4))
        r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), slope)
      }.toMap
    assert(got === expected)
  }

  // ------------------------------------------------------- q215

  test("q215 equals a brute-force rare-shingle containment replay") {
    val W = 8
    val shingles = docTokens().filter(_._2.length >= W).map { case (id, ws) =>
      id -> ws.sliding(W).map(_.mkString(" ")).toSet
    }
    val dfc = shingles.flatMap(_._2.toSeq).groupBy(identity)
      .map { case (sh, g) => (sh, g.length) }
    val rare = shingles.map { case (id, ss) =>
      id -> ss.filter(dfc(_) <= 20)
    }.filter(_._2.nonEmpty).toMap
    val expected = (for {
      (a, sa) <- rare.toSeq; (b, sb) <- rare.toSeq if a != b
      shared = (sa & sb).size.toLong if shared > 0
      bp = shared * 10000 / sa.size if bp >= 2500
    } yield (a, b, shared, sa.size.toLong, bp)).toSet
    val got = SparkEntry.queries("q215_containment_dup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === expected)
  }

  // ------------------------------------------------------- q216

  test("q216 equals a brute-force lift replay over the top-40 vocabulary") {
    val pres = docTokens().map { case (id, ws) => id -> ws.toSet }
    val n = Tables.load(spark, dir, "documents").count()
    val dfc = pres.flatMap(_._2.toSeq).groupBy(identity)
      .map { case (w, g) => (w, g.length.toLong) }
    val top = dfc.toSeq.sortBy { case (w, d) => (-d, w) }.take(40).toMap
    val pairs = pres.flatMap { case (_, ws) =>
      val ts = ws.filter(top.contains).toSeq.sorted
      for (i <- ts.indices; j <- (i + 1) until ts.length)
        yield (ts(i), ts(j))
    }.groupBy(identity).map { case (p, g) => (p, g.length.toLong) }
    val scored = pairs.toSeq.map { case ((t1, t2), cxy) =>
      val lift = (BigInt(cxy) * n * 10000 / (BigInt(top(t1)) * top(t2))).toLong
      (t1, t2, cxy, top(t1), top(t2), lift)
    }
    val expected = scored.sortBy { case (t1, t2, _, _, _, l) => (-l, t1, t2) }
      .take(100)
    val got = SparkEntry.queries("q216_term_cooccur_lift")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected)
  }

  // ------------------------------------------------------- q217 + Morton

  test("MortonCode.interleave matches a per-bit recomputation") {
    val rnd = new scala.util.Random(8)
    for (_ <- 1 to 2000) {
      val x = rnd.nextLong().abs % 65536
      val y = rnd.nextLong().abs % 65536
      val expected = (0 until 16).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
      assert(functions.MortonCode.interleave(x, y) === expected, s"($x, $y)")
    }
  }

  test("graft_morton SQL function evaluates through codegen and matches") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((3L, 5L), (65535L, 0L), (0L, 65535L), (12345L, 54321L))
      .toDF("x", "y")
    val got = df.selectExpr("graft_morton(x, y) AS z").collect().map(_.getLong(0))
    val expected = Seq((3L, 5L), (65535L, 0L), (0L, 65535L), (12345L, 54321L))
      .map { case (x, y) => functions.MortonCode.interleave(x, y) }
    assert(got.toSeq === expected)
    // Morton keys preserve 2-D locality: the max key of a 2x2 block is
    // within 3 of its min (the defining Z-curve property at bit 0).
    for (x <- 0L to 2L; y <- 0L to 2L) {
      val base = functions.MortonCode.interleave(x * 2, y * 2)
      val max = functions.MortonCode.interleave(x * 2 + 1, y * 2 + 1)
      assert(max - base === 3L)
    }
  }

  test("q217 equals a per-row Morton bucket replay") {
    val rows = Tables.load(spark, dir, "lineitem")
      .select("l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0) % 65536, r.getLong(1) % 65536))
    val expected = rows.groupBy { case (x, y) =>
      functions.MortonCode.interleave(x, y) / 1048576
    }.map { case (b, g) =>
      val xs = g.map(_._1); val ys = g.map(_._2)
      (b, (g.length.toLong, xs.min, xs.max, ys.min, ys.max,
        (xs.max - xs.min + 1) * (ys.max - ys.min + 1)))
    }
    val got = SparkEntry.queries("q217_zorder_layout")(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got === expected)
  }
}
