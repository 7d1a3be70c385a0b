package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-14 ADVICE fixes:
  *  - a CURRENT-snapshot read racing a commit's delete-then-rename swap
  *    fails LOUDLY (after a short retry) instead of silently returning
  *    0 rows — only a provably never-written table (no version history)
  *    reads as empty;
  *  - truncate(w, col) partition upper bound saturates at Long.MaxValue
  *    (pv + w - 1 must never wrap negative and prune live files);
  *  - SQL DML shares the sink's stale-lock takeover — a crashed
  *    driver's leftover _commit.lock no longer blocks MERGE/UPDATE
  *    forever;
  *  - file byte lengths are recorded in the manifest at commit time, so
  *    scan statistics never stat data files at plan time.
  */
class AdviceFixSpec7 extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_afx7").toString
    new java.io.File(d).delete()
    d
  }

  test("manifest.json absent + history present = loud failure, not 0 rows") {
    import spark.implicits._
    val src = freshDir()
    Seq(1L, 2L, 3L).toDF("k").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .option("path", src).mode("append").save()
    // simulate the swap window: manifest.json gone, history retained
    assert(new java.io.File(src, "manifest-v1.json").exists())
    java.nio.file.Files.delete(java.nio.file.Paths.get(src, "manifest.json"))
    val e = intercept[Exception] {
      spark.read.format("graft.sources.ManifestSource")
        .schema("k LONG").option("path", src).load().count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("not found")), e)
  }

  test("a never-written directory still reads as an empty table") {
    val src = freshDir()
    new java.io.File(src).mkdirs() // catalog CREATE with no INSERT yet
    assert(spark.read.format("graft.sources.ManifestSource")
      .schema("k LONG").option("path", src).load().count() == 0L)
  }

  test("truncate partition bound saturates near Long.MaxValue") {
    import org.apache.spark.sql.sources._
    val sp = graft.sources.TruncatePartSpec(1000L, "k")
    val pv = sp.pv(Long.MaxValue) // multiple of 1000; pv + 999 overflows
    assert(pv > Long.MaxValue - 999L, "fixture lost its point")
    // rows with k in [pv, Long.MaxValue] DO exist in this partition —
    // none of these probes may prune it
    assert(graft.sources.ManifestPartSpec.pvMayMatch(
      sp, pv, EqualTo("k", Long.MaxValue)))
    assert(graft.sources.ManifestPartSpec.pvMayMatch(
      sp, pv, GreaterThan("k", Long.MaxValue - 10L)))
    assert(graft.sources.ManifestPartSpec.pvMayMatch(
      sp, pv, GreaterThanOrEqual("k", Long.MaxValue)))
    // and a provably-empty probe still prunes
    assert(!graft.sources.ManifestPartSpec.pvMayMatch(
      sp, pv, LessThan("k", pv)))
  }

  test("SQL DML takes over a stale commit lock instead of blocking forever") {
    val base = java.nio.file.Files.createTempDirectory("graft_afx7c").toString
    val cat = "afx7_" + math.abs(base.hashCode)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.ManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    val t = s"$cat.db.t"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')")
    // a crashed driver's lock: valid body, 11-minute-old timestamp
    val lock = java.nio.file.Paths.get(base, "db", "t", "_commit.lock")
    java.nio.file.Files.write(lock,
      s"${System.currentTimeMillis() - 11 * 60 * 1000L} dead-writer"
        .getBytes("UTF-8"))
    spark.sql(s"UPDATE $t SET v = 'x' WHERE k = 1") // must not throw
    assert(spark.sql(s"SELECT v FROM $t WHERE k = 1").collect()
      .head.getString(0) == "x")
    val dir = new java.io.File(base, "db/t")
    assert(!new java.io.File(dir, "_commit.lock").exists(),
      "lock not released after takeover")
    assert(!dir.listFiles().exists(_.getName.startsWith("_commit.lock.stale")),
      "takeover tombstone left behind")
  }

  test("manifest records file bytes; entries round-trip them") {
    import spark.implicits._
    val src = freshDir()
    (1L to 100L).toDF("k").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .option("path", src).mode("append").save()
    val entries = graft.sources.ManifestRead.entries(src, "manifest.json")
    assert(entries.nonEmpty)
    entries.foreach { e =>
      val len = new java.io.File(src, e.file).length()
      assert(e.bytes.contains(len),
        s"${e.file}: manifest bytes ${e.bytes} != on-disk $len")
    }
    // render/parse inverse holds with the new field
    val rendered = entries.map(graft.sources.ManifestRead.render)
      .mkString("[", ",", "]")
    assert(graft.sources.ManifestRead.entriesOfText(rendered) == entries)
  }
}
