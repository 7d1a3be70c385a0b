package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-5 pipeline operators (q131-q136): independent re-computations in
  * plain Scala against the tiny SF so the DuckDB oracles aren't the only
  * line of defense. */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def docTexts(): Map[Long, String] =
    Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private def fiveGrams(text: String): Set[String] = {
    val ws = text.split(' ').filter(_.nonEmpty)
    if (ws.length < 5) Set.empty
    else ws.sliding(5).map(_.mkString(" ")).toSet
  }

  test("q131 decontamination matches a plain-Scala 5-gram overlap") {
    val texts = docTexts()
    val bench = texts.filter { case (id, _) => id % 10 == 7 }
    val expected = texts
      .filter { case (id, _) => id % 10 != 7 }
      .flatMap { case (id, t) =>
        val grams = fiveGrams(t)
        val shared = grams.filter(g => bench.values.exists(fiveGrams(_).contains(g)))
        val hitDocs = bench.count { case (_, bt) => fiveGrams(bt).intersect(grams).nonEmpty }
        if (shared.nonEmpty) Some(id -> ((shared.size.toLong, hitDocs.toLong))) else None
      }
    val got = SparkEntry.queries("q131_decontamination")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("q132 repetition metrics match a plain-Scala recomputation") {
    val texts = docTexts()
    val got = SparkEntry.queries("q132_repetition_metrics")(spark, dir).collect()
    assert(got.length == texts.size)
    got.foreach { r =>
      val ws = texts(r.getLong(0)).split(' ').filter(_.nonEmpty)
      val nTok = ws.length
      val nTypes = ws.distinct.length
      assert(r.getInt(1) == nTok && r.getInt(2) == nTypes)
      val dupFrac = if (nTok > 0) 1.0 - nTypes.toDouble / nTok else 0.0
      assert(r.getDouble(3) == dupFrac)
      val topBg =
        if (nTok < 2) 0L
        else ws.sliding(2).map(_.mkString(" ")).toSeq
          .groupBy(identity).values.map(_.size).max.toLong
      assert(r.getLong(4) == topBg)
      val topFrac = if (nTok > 1) topBg.toDouble / (nTok - 1) else 0.0
      assert(r.getDouble(5) == topFrac)
      assert(r.getBoolean(6) == (dupFrac < 0.7 && topFrac < 0.2))
    }
  }

  test("q133 shard stats cover the corpus exactly once and shards are in range") {
    val total = Tables.load(spark, dir, "documents").count()
    val rows = SparkEntry.queries("q133_shard_assign")(spark, dir).collect()
    assert(rows.map(_.getLong(0)).forall(s => s >= 0 && s < 16))
    assert(rows.map(_.getLong(1)).sum == total, "shard doc counts must partition the corpus")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }

  test("q134 redaction removes every detected email/phone and counts >= 1") {
    val rows = SparkEntry.queries("q134_pii_scrub")(spark, dir).collect()
    rows.foreach { r =>
      assert(r.getInt(1) >= 1, s"doc ${r.getLong(0)}: no email detected in synthetic line")
      assert(r.getInt(2) >= 1, s"doc ${r.getLong(0)}: no phone detected")
      val red = r.getString(3)
      assert(!red.contains("@"), s"unredacted email remains: $red")
      assert(!red.matches(".*[0-9]{3}-[0-9]+.*"), s"unredacted phone remains: $red")
      assert(red.contains("<EMAIL>") && red.contains("<PHONE>"))
    }
  }

  test("q135/q136 sketch properties hold and exact anchors are sane") {
    val q135 = SparkEntry.queries("q135_approx_quantiles")(spark, dir).collect().head
    assert(q135.getBoolean(3), "approx_percentile rank outside tolerance")
    assert(q135.getDouble(0) < q135.getDouble(1) && q135.getDouble(1) < q135.getDouble(2))
    val q136 = SparkEntry.queries("q136_distinct_sketch")(spark, dir).collect().head
    assert(q136.getBoolean(1), "HLL estimate outside 15% of exact")
    assert(q136.getLong(0) > 0)
  }
}
