package graft

import graft.lineage.SqlPreprocessor
import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.MediaIn
import graft.streaming.StreamingOps
import org.scalatest.funsuite.AnyFunSuite

/** Pins the fixes for the round-2/3 ADVICE defects with inputs the
  * driver fixtures don't exercise (non-ASCII payloads, same-microsecond
  * event ties, limit-like identifiers). Expected values are hardcoded
  * from an independent byte-level computation, not derived from the
  * code under test.
  */
class AdviceFixSpec extends AnyFunSuite {

  test("q119 sampleFrames frames over UTF-8 bytes incl multi-byte spans") {
    // 'abcé' * 40 = 200 bytes -> 200 decoded samples -> 7 frames of 32,
    // frames {0,4} sampled. Samples are byte*16 through the REAL WAV
    // round trip; the sampled BYTE sum is ≡ 479 (mod 997, pinned by the
    // pre-codec version of this test), so the sample checksum is
    // (16 * 479) % 997 = 685 (é straddles frame boundaries; computed
    // independently of the code under test).
    val payload = ("abcé" * 40).getBytes("UTF-8")
    assert(payload.length == 200)
    val f = MultimodalOps.sampleFrames(MediaIn(9L, payload))
    assert(f.n_frames == 7)
    assert(f.n_sampled == 2)
    assert(f.sampled_checksum == 685L)
  }

  test("q119 sampleFrames skips the codec on an empty payload") {
    val f = MultimodalOps.sampleFrames(MediaIn(3L, Array.emptyByteArray))
    assert(f.n_frames == 0 && f.n_sampled == 0 && f.sampled_checksum == 0L)
  }

  test("q118 fold tie-breaks same-microsecond events by event_id") {
    // Two events in the same microsecond (2_000_000 us) whose nano order
    // (eid 9 first) differs from event_id order (eid 3 first). The
    // oracle orders by (date_trunc microseconds, event_id), so the
    // crossing of 100 must be attributed to eid 9 (folded second).
    val evs = Seq(
      (7L, 9L, 2_000_000_100L, 60.0),
      (7L, 3L, 2_000_000_900L, 50.0))
    val (alerts, cum) = StreamingOps.thresholdFold(7L, evs, 0L)
    assert(cum == 11000L) // exact cents * 100
    assert(alerts == Seq((7L, 9L, 1L)))
    // Nano-order fold would have attributed it to eid 3 instead.
  }

  test("TOP rewrite fires despite limit-like identifiers") {
    assert(SqlPreprocessor.rewriteDialect("SELECT TOP 5 limit_price FROM t")
      == "SELECT limit_price FROM t LIMIT 5")
    // A real LIMIT clause still suppresses the rewrite.
    val keep = "SELECT TOP 5 a FROM t LIMIT 3"
    assert(SqlPreprocessor.rewriteDialect(keep) == keep)
  }

  test("q148 degenerate corpus: no click row above 50 keeps the base click partition") {
    // Dynamic partition overwrite only replaces partitions present in
    // the incremental frame; with zero qualifying click rows the base
    // click partition must SURVIVE, and the oracle's NOT EXISTS arm
    // models the same outcome. Expected values recomputed by hand.
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = "/tmp/graft_q148_degenerate"
    Seq(
      (1L, 1000000000L, 1L, "click", 10.0, "{}"),
      (2L, 2000000000L, 1L, "click", 20.0, "{}"),
      (3L, 3000000000L, 2L, "view", 30.0, "{}"),
      (4L, 4000000000L, 2L, "view", 60.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q148_dynamic_partition_overwrite")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == Map("click" -> ((2L, 30.0)), "view" -> ((1L, 30.0))))
  }

  test("q53 fingerprint matches the oracle on documents with consecutive spaces") {
    // Spark ascii('') = 0 but DuckDB ord('') = -1 — empty tokens are
    // filtered on both sides; 1551795128 is the DuckDB value for this doc.
    val session = TestSpark.spark
    import session.implicits._
    val fp = Seq("ab  cd").toDF("text")
      .selectExpr(
        """aggregate(
          |  transform(slice(filter(split(text, ' '), w -> w <> ''), 1, 20),
          |            w -> CAST(length(w) * 31 + ascii(w) AS BIGINT)),
          |  7L, (acc, x) -> (acc * 1000003 + x) % 2147483647) AS fp""".stripMargin)
      .as[Long].head()
    assert(fp == 1551795128L)
  }
}
