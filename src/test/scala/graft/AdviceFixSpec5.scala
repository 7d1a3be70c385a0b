package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-11 ADVICE fixes:
  *  - a brand-new streaming consumer bootstraps from the LATEST
  *    snapshot (initial-snapshot semantics) instead of walking
  *    possibly-expired history from v1;
  *  - removeOrphans reclaims aged `_compact-*` scratch dirs left by a
  *    hard-crashed compaction (previously only `_tmp-*`);
  *  - isCompaction / verifyLockOwnership read loops (no short-read
  *    truncation) — exercised via the compaction-skip path below.
  */
class AdviceFixSpec5 extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_afx5").toString
    new java.io.File(d).delete()
    d
  }

  private def append(src: String, ks: Seq[Long]): Unit = {
    import spark.implicits._
    ks.toDF("k").coalesce(1).write.format("graft.sources.ManifestSink")
      .option("path", src).mode("append").save()
  }

  private def drain(src: String, sink: String, ckpt: String): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val q = spark.readStream.format("graft.sources.ManifestSource")
      .schema("k LONG").option("path", src).load()
      .writeStream.format("parquet").option("path", sink)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("fresh stream bootstraps from the latest snapshot after expiry") {
    import spark.implicits._
    val src = freshDir(); val sink = freshDir(); val ckpt = freshDir()
    append(src, Seq(1L, 2L)); append(src, Seq(3L)); append(src, Seq(4L))
    // GC early history: v1/v2 manifests are gone; a fresh stream that
    // walked from v0 would FileNotFound on manifest-v1.json
    graft.sources.ManifestMaintenance.expireSnapshots(spark, src, 1)
    drain(src, sink, ckpt)
    val got = spark.read.schema("k LONG").parquet(sink)
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 3L, 4L), s"got $got")
    // the same checkpoint then tails new appends incrementally
    append(src, Seq(5L)); drain(src, sink, ckpt)
    val got2 = spark.read.schema("k LONG").parquet(sink)
      .as[Long].collect().sorted.toSeq
    assert(got2 == Seq(1L, 2L, 3L, 4L, 5L), s"got $got2")
  }

  test("fresh stream on a compacted+expired table emits each row once") {
    import spark.implicits._
    val src = freshDir(); val sink = freshDir(); val ckpt = freshDir()
    append(src, Seq(1L, 2L)); append(src, Seq(3L))
    val (b, a) = graft.sources.ManifestMaintenance.compact(spark, src, "k LONG")
    assert(b == 2 && a == 1)
    graft.sources.ManifestMaintenance.expireSnapshots(spark, src, 1)
    // initial snapshot = the compaction version's file set: rows appear
    // exactly once even though that version is flagged "compaction":true
    // (the skip applies only to RESTART walks, never the bootstrap)
    drain(src, sink, ckpt)
    val got = spark.read.schema("k LONG").parquet(sink)
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 3L), s"got $got")
  }

  test("removeOrphans reclaims aged _compact-* scratch dirs") {
    val out = freshDir()
    append(out, Seq(1L, 2L))
    val stale = new java.io.File(out, "_compact-deadbeef")
    assert(stale.mkdirs())
    val junk = new java.io.File(stale, "part-junk.csv")
    java.nio.file.Files.write(junk.toPath, "1,x\n".getBytes("UTF-8"))
    // age both past the 10-minute threshold
    val old = System.currentTimeMillis() - 11 * 60 * 1000L
    junk.setLastModified(old); stale.setLastModified(old)
    graft.sources.ManifestMaintenance.removeOrphans(spark, out)
    assert(!stale.exists(), "stale _compact-* scratch dir not reclaimed")
    // a FRESH _compact-* dir (live compaction) must survive
    val live = new java.io.File(out, "_compact-live")
    assert(live.mkdirs())
    graft.sources.ManifestMaintenance.removeOrphans(spark, out)
    assert(live.exists(), "live _compact-* dir wrongly deleted")
    val rows = spark.read.format("graft.sources.ManifestSource")
      .schema("k LONG").option("path", out).load().count()
    assert(rows == 2L)
  }
}
