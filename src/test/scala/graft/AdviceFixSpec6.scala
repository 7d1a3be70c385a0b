package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-12 ADVICE fixes:
  *  - double zone-map bounds and the pruner agree on Spark's ±0.0
  *    semantics (nanSafeCompareDoubles: -0.0 == 0.0) — a file holding
  *    both signed zeros must never be pruned into row loss;
  *  - the streamEpochs ledger parse is anchored to the TOP-LEVEL key,
  *    so a user column literally named `streamEpochs` (whose stats
  *    block renders the same key inside the files array) cannot shadow
  *    the exactly-once guard;
  *  - q418's BM25 integer score is bounded by DOCUMENT length, not
  *    corpus size (integer-avgdl form).
  */
class AdviceFixSpec6 extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_afx6").toString
    new java.io.File(d).delete()
    d
  }

  test("±0.0 data: pruning never loses the -0.0 row, filters agree with Spark") {
    import spark.implicits._
    val src = freshDir()
    Seq(-0.0d, 0.0d, 1.5d).toDF("d").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .option("path", src).mode("append").save()
    def scan = spark.read.format("graft.sources.ManifestSource")
      .schema("d DOUBLE").option("path", src).load()
    // Spark semantics: -0.0 == 0.0, so `d <= 0.0` keeps both zeros,
    // `d < 0.0` keeps neither, `d = 0.0` keeps both. The connector's
    // pushed-filter eval and its file pruner must both agree.
    assert(scan.filter("d <= 0.0").count() == 2L)
    assert(scan.filter("d < 0.0").count() == 0L)
    assert(scan.filter("d = 0.0").count() == 2L)
    assert(scan.filter("d >= 0.0").count() == 3L)
    // and the recorded min bound is the canonical 0.0 (never "-0.0"
    // text that a later parse would order below 0.0)
    val txt = graft.sources.ManifestRead.manifestText(src, "manifest.json")
    assert(!txt.contains("-0.0"), s"manifest recorded a signed-zero bound: $txt")
  }

  test("a user column named streamEpochs cannot shadow the epoch ledger") {
    import spark.implicits._
    val src = freshDir()
    // batch write of a table whose COLUMN is named streamEpochs: its
    // stats render `"streamEpochs":{...}` inside the files array
    Seq(7L, 9L).toDF("streamEpochs").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .option("path", src).mode("append").save()
    val txt = graft.sources.ManifestRead.manifestText(src, "manifest.json")
    assert(txt.contains(""""streamEpochs":{"""),
      s"fixture lost its point — no stats block rendered: $txt")
    // the table was never stream-written: the ledger must parse EMPTY
    assert(graft.sources.ManifestRead.streamEpochs(txt).isEmpty,
      s"stats block shadowed the ledger: ${graft.sources.ManifestRead.streamEpochs(txt)}")
    // a real ledger on the same table still parses (top-level anchor)
    val withLedger = txt.stripSuffix("}") +
      ""","streamEpochs":{"qid-1":42}}"""
    assert(graft.sources.ManifestRead.streamEpochs(withLedger) ==
      Map("qid-1" -> 42L))
  }

  test("q418 BM25 intermediates are corpus-size-invariant (integer avgdl)") {
    // bound check: worst numerator idf·44·ad·tf·10⁴ with idf ≤ 64 and
    // ad, tf ≤ maxdl — fits in Int64 for maxdl up to ~5·10⁵ tokens,
    // independent of how many documents the corpus holds
    val maxdl = 500000L
    val worst = BigInt(64) * 44 * maxdl * maxdl * 10000
    assert(worst < BigInt(Long.MaxValue), s"numerator bound broken: $worst")
    // and the query itself still matches its fixture shape
    val df = SparkEntry.queries("q418_bm25_scoring")(spark, TestSpark.sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) >= 0L))
  }
}
