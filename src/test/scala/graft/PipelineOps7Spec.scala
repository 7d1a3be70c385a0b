package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-8 pipeline operators (q244-q249): plain-Scala replays at
  * sf0.001, independent of both the Spark plans and the DuckDB oracles. */
class PipelineOps7Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  /** Word-3-gram shingle sets, replayed sequentially (split on single
    * space, keep empties — the Sh3OracleCte contract). */
  private lazy val shingleSets: Map[Long, Set[String]] = {
    Tables.load(spark, dir, "documents").select("doc_id", "text").collect()
      .map { r =>
        val ws = r.getString(1).split(" ", -1)
        val gs = (0 until math.max(ws.length - 2, 0))
          .map(i => s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}").toSet
        r.getLong(0) -> gs
      }.toMap
  }

  test("q244 equals brute-force exact Jaccard >= 0.6 over all doc pairs") {
    val sets = shingleSets.filter(_._2.nonEmpty)
    val ids = sets.keys.toSeq.sorted
    val expected = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      inter = (sets(a) & sets(b)).size
      jac = inter.toDouble / (sets(a).size + sets(b).size - inter)
      if jac >= 0.6
    } yield (a, b, jac)).toSet
    val got = SparkEntry.queries("q244_allpairs_jaccard")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected)
  }

  test("q245 equals a sequential A-Res weighted top-5 per language") {
    val rows = Tables.load(spark, dir, "documents")
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def key(id: Long, w: Long): Double = {
      val u = ((id * 2654435761L) % 1048576 + 1) / 1048577.0
      BigDecimal(math.log(u) / math.max(w, 1))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (lang, g) =>
      g.toSeq.sortBy { case (id, _, w) => (-key(id, w), id) }.take(5)
        .map { case (id, _, w) => (lang, id, w) }
    }.toSet
    val got = SparkEntry.queries("q245_weighted_sample")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("q246 equals a sequential word-frequency-weighted pair count") {
    val words = Tables.load(spark, dir, "documents").select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split("[^a-z]+"))
      .filter(_.length > 1)
      .groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    val pairCounts = words.toSeq.flatMap { case (w, c) =>
      (0 until w.length - 1).map(i => w.substring(i, i + 2) -> c)
    }.groupBy(_._1).map { case (p, g) => p -> g.map(_._2).sum }
    val expected = pairCounts.toSeq.sortBy { case (p, n) => (-n, p) }.take(30)
    val got = SparkEntry.queries("q246_bpe_pair_counts")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === expected)
  }

  test("q247 returns the first 200 rows by date plus every tie of the cutoff date") {
    // Collect the date as an ISO string: it sorts identically and is
    // robust to the column's physical type (timestamp vs timestamp_ntz).
    val dates = Tables.load(spark, dir, "orders")
      .selectExpr("cast(o_orderdate as string)", "o_orderkey").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(identity)
    val cutoff = dates(199)._1
    val expected = dates.filter(_._1 <= cutoff).map(_._2).toSet
    val got = SparkEntry.queries("q247_fetch_with_ties")(spark, dir)
      .collect().map(_.getLong(1)).toSet
    assert(got === expected)
    assert(got.size >= 200)
  }

  test("q248 matches NULL keys to NULL exactly once") {
    val rows = SparkEntry.queries("q248_null_safe_join")(spark, dir).collect()
    val nullRows = rows.filter(_.isNullAt(0))
    assert(nullRows.length === 1)
    val cust = Tables.load(spark, dir, "customer")
      .selectExpr("cast(c_nationkey as long)").collect().map(_.getLong(0))
    val nNullCust = cust.count(k => k % 7 == 3)
    assert(nullRows.head.getLong(1) === nNullCust.toLong)
    // Non-null keys behave like a plain equi-join.
    val k0 = rows.find(r => !r.isNullAt(0) &&
      r.getAs[Number](0).longValue == 0L).get
    assert(k0.getLong(1) === cust.count(_ % 7 == 0).toLong)
  }

  test("q249 equals a sequential 16/8/4/2/1 kernel over per-user event history") {
    // unix_micros: millisecond getTime would mis-order same-ms ties.
    val ev = Tables.load(spark, dir, "events")
      .selectExpr("event_id", "user_id", "unix_micros(ts)", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        math.round(r.getDouble(3) * 100)))
    val expected = ev.groupBy(_._2).flatMap { case (_, g) =>
      val sorted = g.sortBy { case (id, _, t, _) => (t, id) }
      sorted.indices.map { i =>
        def at(j: Int): Long = if (i - j >= 0) sorted(i - j)._4 else 0L
        sorted(i)._1 ->
          (16 * at(0) + 8 * at(1) + 4 * at(2) + 2 * at(3) + at(4))
      }
    }
    val got = SparkEntry.queries("q249_exp_decay_smooth")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === expected)
  }
}
