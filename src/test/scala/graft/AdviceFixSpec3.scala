package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-10 ADVICE fixes with the inputs that exposed them.
  * (The MV duplicate-sensitive-aggregate decline is pinned in
  * ModernOps5Spec; the dialect analysis-path fallbacks in
  * ExtensionsSpec; the stale commit lock in ManifestSinkSpec.)
  */
class AdviceFixSpec3 extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q357 emits the final hour bar on a corpus spanning 300 days") {
    // The old sentinel shifted an ARBITRARY row +2400h; on a corpus
    // spanning more than ~100 days that can land BEFORE the last real
    // event, leaving the tail bars stuck in state. 300 days of events
    // reproduce exactly that regime; the sentinel now derives from the
    // max-ts row, so every real window must flush.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q357_span").toString
    val dayUs = 86400000000L
    val rows = (0 until 600).map { i =>
      val us = 1640995200000000L + i.toLong * dayUs / 2 // 2 events/day, 300 days
      (i.toLong, us, 1000L + i, if (i % 2 == 0) "click" else "view",
        (i % 50).toDouble + 0.25, "{}")
    }
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(2)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val bars = SparkEntry.queries("q357_stream_ohlc")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(bars.nonEmpty)
    val lastUs = 1640995200000000L + 599L * dayUs / 2
    val lastHour = lastUs / 3600000000L
    // the very last event's hour bar must be present for its type
    val lastType = if (599 % 2 == 0) "click" else "view"
    assert(bars.contains((lastType, lastHour)),
      s"tail bar ($lastType, $lastHour) missing — watermark sentinel " +
        s"did not clear the final window; got max hour ${bars.map(_._2).max}")
    // and per type, the bar count equals the distinct real event hours
    val expected = rows.map(r => (r._4, r._2 / 3600000000L)).distinct.size
    assert(bars.length == expected,
      s"expected $expected bars, got ${bars.length}")
  }
}
