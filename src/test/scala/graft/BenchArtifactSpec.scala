package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench artifact to the query surface: BENCH_full.json must
  * carry a timing row for EVERY registered query (and no stale rows for
  * queries that no longer exist), so a new operator can never ship
  * without a bench measurement — the round-9 gap where q383–q386 missed
  * the per-query artifact. Regenerate with `bash tools/release.sh`.
  */
class BenchArtifactSpec extends AnyFunSuite {

  test("BENCH_full.json rows == SparkEntry.queries keys") {
    val f = new java.io.File("BENCH_full.json")
    assert(f.exists(), "BENCH_full.json missing — run tools/release.sh")
    val txt = new String(
      java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    // keys of the "queries" object — names are [A-Za-z0-9_]+, values
    // numeric, so a targeted regex beats pulling in a JSON dependency
    val obj = """"queries"\s*:\s*\{([^}]*)\}""".r
      .findFirstMatchIn(txt).map(_.group(1))
      .getOrElse(fail("no queries object in BENCH_full.json"))
    val benched = """"(q[A-Za-z0-9_]+)"\s*:""".r
      .findAllMatchIn(obj).map(_.group(1)).toSet
    val registered = SparkEntry.queries.keySet
    val missing = registered -- benched
    val stale = benched -- registered
    assert(missing.isEmpty && stale.isEmpty,
      s"BENCH_full.json out of sync — missing rows: ${missing.toSeq.sorted}; " +
        s"stale rows: ${stale.toSeq.sorted}. Run tools/release.sh to refresh.")
  }

  test("BENCH_full.json carries {shuffle_mb, spill_mb} per query") {
    val f = new java.io.File("BENCH_full.json")
    assert(f.exists(), "BENCH_full.json missing — run tools/release.sh")
    val txt = new String(
      java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    val qmBlock = """"query_metrics"\s*:\s*\{(.*?)\}\s*,\s*"errors"""".r
      .findFirstMatchIn(txt).map(_.group(1))
      .getOrElse(fail("no query_metrics object in BENCH_full.json — " +
        "regenerate with tools/release.sh"))
    val withMetrics =
      """"(q[A-Za-z0-9_]+)"\s*:\s*\{"shuffle_mb":[-0-9.E]+,"spill_mb":[-0-9.E]+\}""".r
        .findAllMatchIn(qmBlock).map(_.group(1)).toSet
    val registered = SparkEntry.queries.keySet
    val missing = registered -- withMetrics
    assert(missing.isEmpty,
      s"queries without {shuffle_mb, spill_mb} rows: ${missing.toSeq.sorted}")
  }

  test("every fixed-cost-bound name is a registered query") {
    val unknown = SparkEntry.fixedCostBound -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"fixedCostBound names not registered: $unknown")
  }
}
