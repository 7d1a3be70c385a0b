package graft.streaming

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DecimalType

/** Round-9 streaming surfaces, part 4:
  *
  *  - q357 streaming OHLC bars: q353's bar aggregation as a
  *    Structured Streaming job — tumbling 1-hour event-time windows
  *    per event_type, with open/close pinned DETERMINISTICALLY via
  *    `min_by`/`max_by` over the total order `struct(ts, event_id)`
  *    (`first()` in a streaming agg is arrival-order roulette; the
  *    argmin/argmax pair is the only merge-safe way to get bar ends).
  *    Events arrive in three chronological chunks drained separately,
  *    so windows that straddle chunk boundaries exercise state merge
  *    across micro-batches; a far-future sentinel advances the
  *    watermark to flush the tail, and the batch DuckDB oracle (the
  *    q353 row_number formulation at hour grain) must match exactly —
  *    state per (type, open hour) is O(1), the 100 TB-safe shape.
  */
object StreamingOps4 {

  private val q357 = Q(
    "q357_stream_ohlc",
    """WITH e AS (
      |  SELECT event_type, event_id,
      |    epoch_us(ts) // 3600000000 AS hour, ts,
      |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |  FROM events
      |  WHERE ts IS NOT NULL AND value IS NOT NULL
      |    AND event_type IS NOT NULL),
      |ranked AS (
      |  SELECT event_type, hour, cents,
      |    row_number() OVER (PARTITION BY event_type, hour
      |      ORDER BY ts, event_id) AS rn_a,
      |    row_number() OVER (PARTITION BY event_type, hour
      |      ORDER BY ts DESC, event_id DESC) AS rn_d
      |  FROM e)
      |SELECT event_type, CAST(hour AS BIGINT) AS hour,
      |  CAST(max(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open,
      |  CAST(max(cents) AS BIGINT) AS high,
      |  CAST(min(cents) AS BIGINT) AS low,
      |  CAST(max(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM ranked GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    s.conf.set("spark.sql.streaming.schemaInference", "false")
    val savedParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val base = new java.io.File(s"/tmp/graft_q357_${math.abs(dir.hashCode)}")
      if (base.exists()) {
        java.nio.file.Files.walk(base.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
      val stage = s"$base/stage"; val sink = s"$base/sink"
      val ckpt = s"$base/ckpt"
      val ev = Tables.load(s, dir, "events")
        .filter(col("ts").isNotNull && col("value").isNotNull &&
          col("event_type").isNotNull)
        .select(col("event_id"), col("ts"), col("event_type"),
          (col("value").cast(DecimalType(12, 2)) * 100).cast("long")
            .as("cents"))
      val maxRealUs = ev.agg(max(unix_micros(col("ts")))).first().getLong(0)
      val (loUs, hiUs) =
        (ev.agg(min(unix_micros(col("ts")))).first().getLong(0), maxRealUs)
      def drain(): Unit = {
        val q = s.readStream.schema(ev.schema).parquet(stage)
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(
            min_by(col("cents"), struct(col("ts"), col("event_id")))
              .as("open"),
            max(col("cents")).as("high"), min(col("cents")).as("low"),
            max_by(col("cents"), struct(col("ts"), col("event_id")))
              .as("close"),
            count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
          .writeStream.format("parquet").option("path", sink)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // three chronological chunks: mid-hour boundaries force bars to
      // merge partial state across micro-batches
      val thirds = Seq(
        (loUs, loUs + (hiUs - loUs) / 3),
        (loUs + (hiUs - loUs) / 3 + 1, loUs + 2 * (hiUs - loUs) / 3),
        (loUs + 2 * (hiUs - loUs) / 3 + 1, hiUs))
      thirds.foreach { case (a, b) =>
        ev.filter(unix_micros(col("ts")).between(a, b))
          .write.mode("append").parquet(stage)
        drain()
      }
      // sentinel strictly past the data: derived from the MAX-ts row
      // (not an arbitrary row) so the watermark provably advances past
      // the last real hour window at any corpus time span
      ev.orderBy(col("ts").desc).limit(1)
        .withColumn("ts", col("ts") + expr("INTERVAL 3 HOURS"))
        .write.mode("append").parquet(stage)
      drain()
      s.read.parquet(sink)
        .withColumn("start_us", unix_micros(col("window.start")))
        .filter(col("start_us") <= maxRealUs)
        .select(col("event_type"),
          (col("start_us") / 3600000000L).cast("long").as("hour"),
          col("open").cast("long").as("open"),
          col("high").cast("long").as("high"),
          col("low").cast("long").as("low"),
          col("close").cast("long").as("close"),
          col("n").cast("long").as("n"),
          col("sum_cents").cast("long").as("sum_cents"))
        .orderBy("event_type", "hour")
    } finally s.conf.set("spark.sql.shuffle.partitions", savedParts)
  }

  /** q372: UPDATE-mode emission contract. A streaming count per
    * (event_type, day) drains three chronological chunks (one file →
    * one micro-batch each, coalesce(1) + AvailableNow), and foreachBatch
    * captures every emitted row. Update mode must emit a key exactly in
    * the batches where its aggregate CHANGED — so per key the emission
    * count equals the number of chunks containing at least one of its
    * events, and the last emission carries the full total. The DuckDB
    * oracle replays the thirds split arithmetically and computes both
    * numbers from the batch table — pinning the changed-keys-only
    * contract that makes update-mode sinks (upsert stores) affordable:
    * per batch you ship deltas, never the whole state. */
  private val q372 = Q(
    "q372_stream_update_mode",
    """WITH e AS (
      |  SELECT event_type, epoch_us(ts) AS us, CAST(ts AS DATE) AS day
      |  FROM events
      |  WHERE ts IS NOT NULL AND event_type IS NOT NULL),
      |bounds AS (SELECT min(us) AS lo, max(us) AS hi FROM e),
      |chunked AS (
      |  SELECT event_type, day,
      |    CASE WHEN us <= lo + (hi - lo) // 3 THEN 0
      |         WHEN us <= lo + 2 * ((hi - lo) // 3) + 1 THEN 1
      |         ELSE 2 END AS chunk
      |  FROM e CROSS JOIN bounds)
      |SELECT event_type,
      |  CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT) AS day,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(DISTINCT chunk) AS BIGINT) AS n_emissions
      |FROM chunked GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    s.conf.set("spark.sql.streaming.schemaInference", "false")
    val savedParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val base = new java.io.File(s"/tmp/graft_q372_${math.abs(dir.hashCode)}")
      if (base.exists()) {
        java.nio.file.Files.walk(base.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
      val stage = s"$base/stage"; val sink = s"$base/sink"
      val ckpt = s"$base/ckpt"
      val ev = Tables.load(s, dir, "events")
        .filter(col("ts").isNotNull && col("event_type").isNotNull)
        .select(col("event_id"), col("ts"), col("event_type"))
      val (loUs, hiUs) = {
        val r = ev.agg(min(unix_micros(col("ts"))),
          max(unix_micros(col("ts")))).first()
        (r.getLong(0), r.getLong(1))
      }
      def drain(): Unit = {
        val q = s.readStream.schema(ev.schema).parquet(stage)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
              id: Long) =>
            batch.withColumn("batch_id", lit(id))
              .write.mode("append").parquet(sink)
          }
          .option("checkpointLocation", ckpt)
          .outputMode("update")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // one FILE per chunk → one micro-batch per drain: the emission
      // count below is deterministic
      val thirds = Seq(
        (loUs, loUs + (hiUs - loUs) / 3),
        (loUs + (hiUs - loUs) / 3 + 1, loUs + 2 * ((hiUs - loUs) / 3) + 1),
        (loUs + 2 * ((hiUs - loUs) / 3) + 1 + 1, hiUs))
      thirds.foreach { case (a, b) =>
        ev.filter(unix_micros(col("ts")).between(a, b))
          .coalesce(1).write.mode("append").parquet(stage)
        drain()
      }
      val emitted = s.read.parquet(sink)
      emitted.groupBy("event_type", "day")
        .agg(max(struct(col("batch_id"), col("n"))).getField("n").as("n"),
          countDistinct("batch_id").as("n_emissions"))
        .select(col("event_type"),
          datediff(col("day"), lit("1970-01-01")).cast("long").as("day"),
          col("n").cast("long").as("n"),
          col("n_emissions").cast("long").as("n_emissions"))
        .orderBy("event_type", "day")
    } finally s.conf.set("spark.sql.shuffle.partitions", savedParts)
  }

  val defs: Seq[Q] = Seq(q357, q372)
}
