package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-8 batch-2 operators (q250-q254): plain-Scala replays at
  * sf0.001, independent of both the Spark plans and the DuckDB
  * oracles. */
class PipelineOps8Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def levenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("q250 equals a sequential block-match-union-find entity resolution") {
    val names = Tables.load(spark, dir, "part").select("p_name").distinct()
      .collect().map(_.getString(0))
    val byNoun = names.groupBy(_.split(" ").last)
    val parent = scala.collection.mutable.Map(names.map(n => n -> n): _*)
    def find(x: String): String =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    def union(x: String, y: String): Unit = {
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) parent(if (rx < ry) ry else rx) = if (rx < ry) rx else ry
    }
    for (band <- byNoun.values; i <- band.indices; j <- (i + 1) until band.length
         if levenshtein(band(i), band(j)) <= 4)
      union(band(i), band(j))
    // Root by min member, matching the min-label fixpoint.
    val comps = names.groupBy(find).map { case (_, ms) =>
      val sorted = ms.sorted
      (sorted.head, ms.length.toLong, sorted.mkString("|"))
    }.toSet
    val got = SparkEntry.queries("q250_entity_resolution")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(got === comps)
  }

  test("q251 interpolates gap days linearly in integer cents") {
    val rows = SparkEntry.queries("q251_interpolate_daily")(spark, dir)
      .selectExpr("user_id", "cast(day as string)", "cents", "observed")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    // Per user: grid is contiguous, endpoints observed, and every
    // interpolated day satisfies the exact integer-division formula
    // against its nearest observed neighbors.
    rows.groupBy(_._1).foreach { case (_, g) =>
      val days = g.sortBy(_._2)
      assert(days.head._4 && days.last._4) // endpoints observed
      val dayNum = days.indices.toArray    // contiguous by construction
      for (i <- days.indices if !days(i)._4) {
        val p = (i - 1 to 0 by -1).find(days(_)._4).get
        val n = (i + 1 until days.length).find(days(_)._4).get
        val expected = (days(p)._3 * (dayNum(n) - dayNum(i)) +
          days(n)._3 * (dayNum(i) - dayNum(p))) / (dayNum(n) - dayNum(p))
        assert(days(i)._3 === expected)
      }
    }
    // The grid really is daily-contiguous (no missing calendar days).
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (_, g) =>
      val ds = g.map(_._2).sorted
      val first = java.time.LocalDate.parse(ds.head.take(10))
      ds.zipWithIndex.foreach { case (d, i) =>
        assert(java.time.LocalDate.parse(d.take(10)) === first.plusDays(i))
      }
    }
  }

  test("q252 pairs follow the hash-ring formula and never self-pair") {
    val nd = Tables.load(spark, dir, "documents").count()
    val got = SparkEntry.queries("q252_negative_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.length === nd * 3)
    got.foreach { case (a, k, neg) =>
      val raw = (a * 2654435761L + k * 7919) % nd
      val expected = if (raw == a) (raw + 1) % nd else raw
      assert(neg === expected)
      assert(neg != a)
    }
  }

  test("q253 z-scores match an exact-aggregate replay") {
    val ev = Tables.load(spark, dir, "events")
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), math.round(r.getDouble(2) * 100)))
    val stats = ev.groupBy(_._2).map { case (t, g) =>
      val n = g.length.toLong
      val s = g.map(x => BigInt(x._3)).sum
      val q = g.map(x => BigInt(x._3) * BigInt(x._3)).sum
      t -> (n, s, q)
    }
    val expected = ev.map { case (id, t, x) =>
      val (n, s, q) = stats(t)
      val num = (BigInt(x) * n - s).toDouble
      val den = math.sqrt((q * n - s * s).toDouble)
      id -> BigDecimal(num / den)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = SparkEntry.queries("q253_zscore_normalize")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (id, z) => assert(math.abs(z - expected(id)) < 1e-9) }
  }

  test("q254 medians/MAD are the discrete lower-median elements") {
    val ev = Tables.load(spark, dir, "events")
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), math.round(r.getDouble(2) * 100)))
    val expected = ev.groupBy(_._2).map { case (t, g) =>
      def lowerMed(xs: Seq[(Long, Long)]): Long = { // (value, id)
        val sorted = xs.sortBy(identity)
        sorted((xs.length + 1) / 2 - 1)._1
      }
      val med = lowerMed(g.map(e => (e._3, e._1)).toSeq)
      val devs = g.map(e => (math.abs(e._3 - med), e._1)).toSeq
      val mad = lowerMed(devs)
      val out = devs.count(_._1 > 3 * mad).toLong
      t -> (med, mad, out, g.length.toLong)
    }
    val got = SparkEntry.queries("q254_mad_outliers")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === expected)
  }
}
