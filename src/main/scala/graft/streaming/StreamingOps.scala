package graft.streaming

import graft.{Q, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface (all-new capability; the reference has no
  * streaming — SURVEY §2.10). The events parquet drives a real streaming
  * query synchronously via the memory sink (`processAllAvailable`), so
  * the result is batch-deterministic and oracle-checkable while the plan
  * is a genuine StreamingQuery (file source → event-time window agg →
  * sink). On a cluster the same code runs continuously off a directory /
  * Kafka source with the same semantics.
  */
object StreamingOps {

  // Memory-sink names must be unique per invocation: the sink registers a
  // session temp view under the queryName, so a second run of the same
  // query in one session (ScaleSmoke alternates sf dirs) would otherwise
  // race a fresh start against a lazy read of the previous run's view.
  private val sinkSeq = new java.util.concurrent.atomic.AtomicLong()
  private[streaming] def uniqueSink(base: String): String =
    s"${base}_${sinkSeq.incrementAndGet()}"

  private val q70 = Q(
    "q70_stream_window_agg",
    """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    s.conf.set("spark.sql.streaming.schemaInference", "false")
    val sinkName = uniqueSink("graft_q70_sink")
    val savedParts = s.conf.get("spark.sql.shuffle.partitions")
    // Each state-store partition carries real per-batch setup cost in
    // local mode; 8 partitions is plenty for this key cardinality.
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try {
    val stream = Tables.eventsStream(s, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).as("total_dec"))
    val query = stream.writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("complete")
      .start()
    try {
      query.processAllAvailable()
    } finally {
      query.stop()
    }
    s.table(sinkName)
      .select(col("window.start").cast("date").as("day"), col("event_type"),
        col("n"), col("total_dec").cast("double").as("total_value"))
      .orderBy("day", "event_type")
    } finally s.conf.set("spark.sql.shuffle.partitions", savedParts)
  }

  /** Stateful stream: per-user running event counts via
    * mapGroupsWithState, checked against a batch GROUP BY oracle. */
  private val q71 = Q(
    "q71_stream_stateful",
    """SELECT user_id, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val sinkName = uniqueSink("graft_q71_sink")
    val savedParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try {
    val stream = Tables.eventsStream(s, dir)
      .select(col("user_id"), col("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[ (Long, Long), (Long, Long, Long) ](
        GroupStateTimeout.NoTimeout) {
        case (uid, evs, state: GroupState[(Long, Long)]) =>
          val (n0, c0) = state.getOption.getOrElse((0L, 0L))
          var n = n0
          var cents = c0
          evs.foreach { case (_, v) =>
            n += 1
            cents += math.round(v * 100) // exact: 2-decimal doubles
          }
          state.update((n, cents))
          (uid, n, cents)
      }
    val query = stream.toDF("user_id", "n_events", "cents").writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode(OutputMode.Update())
      .start()
    try query.processAllAvailable() finally query.stop()
    // Update-mode emits one row per key per batch; keep the latest state.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("n_events").desc)
    s.table(sinkName)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("n_events"),
        (col("cents").cast("double") / 100).as("total_value"))
      .orderBy("user_id")
    } finally s.conf.set("spark.sql.shuffle.partitions", savedParts)
  }

  /** Sessionization: session_window with a 30-minute gap (batch form of
    * the same operator Structured Streaming uses for stateful
    * sessionization). Oracle: classic gaps-and-islands SQL — new session
    * only when the gap to the previous event EXCEEDS 30 min: Spark's
    * merge is boundary-inclusive (an event exactly at last+gap extends
    * the session — pinned by ModernOpsSpec's session_window probe). */
  private val q72s = Q(
    "q72_session_window",
    """WITH e AS (SELECT user_id, date_trunc('microseconds', ts) AS ts FROM events),
      |m AS (SELECT user_id, ts,
      |        CASE WHEN lag(ts) OVER w IS NULL
      |             OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
      |             THEN 1 ELSE 0 END AS new_sess
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (SELECT user_id, ts,
      |        SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
      |          ROWS UNBOUNDED PRECEDING) AS sess_id
      |      FROM m)
      |SELECT user_id,
      |  CAST(epoch_us(MIN(ts)) AS BIGINT) AS session_start_us,
      |  CAST(epoch_us(MAX(ts)) AS BIGINT) AS session_last_us,
      |  COUNT(*) AS n_events
      |FROM s GROUP BY user_id, sess_id
      |ORDER BY user_id, session_start_us""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("first_ts")).as("session_start_us"),
        unix_micros(col("last_ts")).as("session_last_us"),
        col("n_events"))
      .orderBy("user_id", "session_start_us")
  }

  /** Streaming deduplication (the LLM-pipeline ingest guard): duplicated
    * input (each event emitted twice) is deduped on event_id with
    * `dropDuplicates` + watermark — state expires with event time, so
    * memory is bounded at 100 TB/day ingest. Verified against the batch
    * per-type counts of the original (un-duplicated) table. */
  private val q117 = Q(
    "q117_stream_dedup",
    """SELECT event_type, COUNT(*) AS n FROM events
      |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    val sinkName = uniqueSink("graft_q117_sink")
    val savedParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val stream = Tables.eventsStream(s, dir)
        .withColumn("copy", explode(array(lit(1), lit(2)))) // inject dups
        .drop("copy")
        .withWatermark("ts", "1 hour")
        .dropDuplicates("event_id", "ts")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
      val query = stream.writeStream
        .format("memory").queryName(sinkName)
        .outputMode("complete").start()
      try query.processAllAvailable() finally query.stop()
      s.table(sinkName).orderBy("event_type")
    } finally s.conf.set("spark.sql.shuffle.partitions", savedParts)
  }

  /** q118 per-group fold: events (user_id, event_id, ts_nanos, value)
    * are folded in (µs-truncated ts, event_id) order — matching the
    * oracle's `ORDER BY date_trunc('microseconds', ts), event_id` — so
    * two same-user events landing in the same microsecond tie-break
    * identically on both engines. Returns (alerts, new cumulative cents). */
  def thresholdFold(
      uid: Long, evs: Seq[(Long, Long, Long, Double)], cum0: Long)
      : (Seq[(Long, Long, Long)], Long) = {
    var cum = cum0
    val out = Seq.newBuilder[(Long, Long, Long)]
    evs.sortBy(e => (e._3 / 1000, e._2)).foreach { case (_, eid, _, v) =>
      val cents = math.round(v * 100)
      val before = cum / 10000
      cum += cents
      if (cum / 10000 > before) out += ((uid, eid, cum / 10000))
    }
    (out.result(), cum)
  }

  /** flatMapGroupsWithState: per-user threshold-crossing alerts — emit a
    * row each time the running value total crosses a multiple of 100
    * (0..n rows per group per batch, the shape mapGroupsWithState can't
    * express). Events are folded in (µs ts, event_id) order with exact
    * cent arithmetic, so the crossing set is deterministic; the oracle
    * is the batch cumulative-sum crossing scan. */
  private val q118 = Q(
    "q118_stream_threshold_alerts",
    """WITH c AS (
      |  SELECT user_id, event_id,
      |    CAST(ROUND(value * 100) AS BIGINT) AS cents,
      |    SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
      |      PARTITION BY user_id ORDER BY date_trunc('microseconds', ts), event_id
      |      ROWS UNBOUNDED PRECEDING) AS cum_cents
      |  FROM events)
      |SELECT user_id, event_id, CAST(cum_cents // 10000 AS BIGINT) AS level
      |FROM c
      |WHERE cum_cents // 10000 > (cum_cents - cents) // 10000
      |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val sinkName = uniqueSink("graft_q118_sink")
    val savedParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      // The fold's contract is ts in nanos (tie-break at µs granularity);
      // eventsStream yields µs timestamps, so scale back up losslessly.
      val stream = Tables.eventsStream(s, dir)
        .select(col("user_id"), col("event_id"),
          (unix_micros(col("ts")) * 1000).as("ts"), col("value"))
        .as[(Long, Long, Long, Double)]
        .groupByKey(_._1)
        .flatMapGroupsWithState[Long, (Long, Long, Long)](
          OutputMode.Append(), GroupStateTimeout.NoTimeout) {
          case (uid, evs, state: GroupState[Long]) =>
            val (alerts, cum) =
              thresholdFold(uid, evs.toSeq, state.getOption.getOrElse(0L))
            state.update(cum)
            alerts.iterator
        }
      val query = stream.toDF("user_id", "event_id", "level").writeStream
        .format("memory").queryName(sinkName)
        .outputMode(OutputMode.Append()).start()
      try query.processAllAvailable() finally query.stop()
      s.table(sinkName).orderBy("user_id", "event_id")
    } finally s.conf.set("spark.sql.shuffle.partitions", savedParts)
  }

  /** Watermarked stream-stream interval join (the remaining canonical
    * Structured Streaming shape): attribute each purchase to every view
    * by the same user in the preceding hour. Both sides carry event-time
    * watermarks and the join condition bounds the time range, so state
    * for either side expires once the other side's watermark passes —
    * per-key state is bounded at any corpus size. Inner-join matches
    * emit per micro-batch (no watermark wait); the compact per-user
    * summary is aggregated batch-side from the emitted pairs. */
  private val q125 = Q(
    "q125_stream_stream_join",
    // ts truncated to µs on BOTH sides (Spark reads nanos div 1000; a
    // nanosecond-precision oracle would disagree at exact-boundary
    // pairs — the q118 divergence class).
    """SELECT v.user_id AS user_id, COUNT(*) AS n_pairs,
      |  CAST(SUM(CAST(p.value AS DECIMAL(12,2))) AS DOUBLE) AS purchase_value
      |FROM events v JOIN events p
      |  ON v.user_id = p.user_id
      |  AND v.event_type = 'view' AND p.event_type = 'purchase'
      |  AND date_trunc('microseconds', p.ts) >= date_trunc('microseconds', v.ts)
      |  AND date_trunc('microseconds', p.ts)
      |      <= date_trunc('microseconds', v.ts) + INTERVAL 1 HOUR
      |GROUP BY v.user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    val sinkName = uniqueSink("graft_q125_sink")
    val savedParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      def src = Tables.eventsStream(s, dir)
      val views = src.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
        .withWatermark("v_ts", "1 hour")
      val purchases = src.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value"))
        .withWatermark("p_ts", "1 hour")
      val joined = views.join(purchases,
        expr("""v_user = p_user AND
               |p_ts >= v_ts AND p_ts <= v_ts + INTERVAL 1 HOUR""".stripMargin))
      val query = joined.writeStream
        .format("memory").queryName(sinkName)
        .outputMode("append").start()
      try query.processAllAvailable() finally query.stop()
      s.table(sinkName)
        .groupBy(col("v_user").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("value").cast(DecimalType(12, 2))).cast("double")
            .as("purchase_value"))
        .orderBy("user_id")
    } finally s.conf.set("spark.sql.shuffle.partitions", savedParts)
  }

  /** Sliding event-time windows (q70 covers tumbling): 6-hour windows
    * sliding every 3 hours, so each event lands in exactly 2 windows.
    * Spark aligns sliding windows to the epoch in multiples of the
    * slide; the oracle replays that arithmetic directly ((us div 3h)*3h
    * and the preceding start). Window starts are emitted as epoch
    * microseconds — BIGINT on both engines, no timestamp-encoding
    * drift. */
  private val q153 = Q(
    "q153_stream_sliding_window",
    """WITH e AS (
      |  SELECT epoch_us(date_trunc('microseconds', ts)) AS us,
      |         event_type, value
      |  FROM events),
      |w AS (
      |  SELECT unnest([
      |      (us // 10800000000) * 10800000000 - 10800000000,
      |      (us // 10800000000) * 10800000000]) AS win_start,
      |    event_type, value
      |  FROM e)
      |SELECT win_start, event_type, count(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    s.conf.set("spark.sql.streaming.schemaInference", "false")
    val sinkName = uniqueSink("graft_q153_sink")
    val savedParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val stream = Tables.eventsStream(s, dir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "6 hours", "3 hours"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(12, 2))).as("total_dec"))
      val query = stream.writeStream
        .format("memory")
        .queryName(sinkName)
        .outputMode("complete")
        .start()
      try {
        query.processAllAvailable()
      } finally {
        query.stop()
      }
      s.table(sinkName)
        .select(unix_micros(col("window.start")).as("win_start"),
          col("event_type"), col("n"),
          col("total_dec").cast("double").as("total_value"))
        .orderBy("win_start", "event_type")
    } finally s.conf.set("spark.sql.shuffle.partitions", savedParts)
  }

  /** foreachBatch sink — the production streaming WRITE path (the other
    * streaming queries use the memory sink): each micro-batch appends
    * parquet with its batch id, the final state is read back and
    * aggregated. Append-only over a finite source, so the result is
    * batching-independent and equals the batch oracle. */
  private val q160 = Q(
    "q160_stream_foreach_batch",
    """SELECT event_type, count(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      |FROM events WHERE value > 10
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    s.conf.set("spark.sql.streaming.schemaInference", "false")
    val out = s"/tmp/graft_q160_sink_${math.abs(dir.hashCode)}"
    val outDir = new java.io.File(out)
    if (outDir.exists()) {
      java.nio.file.Files.walk(outDir.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    val stream = Tables.eventsStream(s, dir)
      .filter(col("value") > 10)
      .select(col("event_type"), col("value"))
    val query = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.withColumn("batch_id", lit(id))
          .write.mode("append").parquet(out)
        ()
      }
      .option("checkpointLocation", s"$out.ckpt_${System.nanoTime()}")
      .start()
    try {
      query.processAllAvailable()
    } finally {
      query.stop()
    }
    s.read.parquet(out)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double")
          .as("total_value"))
      .orderBy("event_type")
  }

  private val q170 = Q(
    "q170_stream_restart_exactly_once",
    """SELECT event_type, count(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
      |  count(DISTINCT user_id) AS users
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    // Checkpointed restart with Trigger.AvailableNow — the production
    // incremental-ingest shape: run N drains everything new and stops;
    // run N+1 resumes from the SAME checkpoint and must process only
    // files that arrived in between. The final aggregate equals the
    // batch answer over the full table only if the second run neither
    // reprocesses (counts would double) nor drops the new arrivals —
    // the oracle comparison IS the exactly-once check.
    s.conf.set("spark.sql.streaming.schemaInference", "false")
    val base = new java.io.File(s"/tmp/graft_q170_${math.abs(dir.hashCode)}")
    if (base.exists()) {
      java.nio.file.Files.walk(base.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    val stage = s"$base/stage"; val sink = s"$base/sink"; val ckpt = s"$base/ckpt"
    val ev = Tables.load(s, dir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    def drainOnce(): Unit = {
      val q = s.readStream.schema(ev.schema).parquet(stage)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(sink)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    ev.filter(col("user_id") % 2 === 0).write.mode("append").parquet(stage)
    drainOnce()
    ev.filter(col("user_id") % 2 =!= 0).write.mode("append").parquet(stage)
    drainOnce()
    s.read.parquet(sink)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double").as("total_value"),
        countDistinct(col("user_id")).as("users"))
      .orderBy("event_type")
  }

  private val q176 = Q(
    "q176_stream_static_join",
    """SELECT c.c_mktsegment AS segment, count(*) AS n,
      |  CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    // Stream-static enrichment — the most common production streaming
    // join: a fact stream joined to a broadcast dimension snapshot.
    // Stateless per-row enrichment (no watermark, no join state; only
    // the downstream aggregation keeps state), so at scale the join
    // adds zero shuffle to the stream side.
    s.conf.set("spark.sql.streaming.schemaInference", "false")
    val sinkName = uniqueSink("graft_q176_sink")
    val cust = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val stream = Tables.eventsStream(s, dir)
      .join(org.apache.spark.sql.functions.broadcast(cust),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).as("total_dec"))
    val query = stream.writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("complete")
      .start()
    try {
      query.processAllAvailable()
    } finally {
      query.stop()
    }
    s.table(sinkName)
      .select(col("segment"), col("n"),
        col("total_dec").cast("double").as("total_value"))
      .orderBy("segment")
  }

  /** Watermark late-data semantics, pinned end to end: rows arriving
    * after the watermark has passed their window must be DROPPED, not
    * silently aggregated — the guarantee that bounds streaming state at
    * 100 TB (without it every straggler shard reopens old windows
    * forever). Three AvailableNow drains over one checkpoint: (1) the
    * on-time span (everything >= cutoff) establishes the watermark at
    * max(ts)-1h; (2) the entire first day arrives LATE — every row sits
    * below the watermark and must vanish; (3) one far-future sentinel
    * row advances the watermark past every real window end so append
    * mode finalizes all real windows deterministically (AvailableNow's
    * no-data batches flush the finalized windows within the same
    * drain). The oracle is the batch answer over ONLY the
    * on-time rows: equality proves the late batch contributed nothing
    * and no on-time window was lost or emitted twice. Sentinel windows
    * sit past floor_hour(max) and are filtered from the sink read. */
  private val q189 = Q(
    "q189_stream_late_data",
    """WITH c AS (SELECT date_trunc('hour', min(ts)) + INTERVAL 24 HOUR AS cut
      |           FROM events)
      |SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS window_start_us,
      |  count(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      |FROM events, c WHERE ts >= c.cut
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    s.conf.set("spark.sql.streaming.schemaInference", "false")
    val savedParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val base = new java.io.File(s"/tmp/graft_q189_${math.abs(dir.hashCode)}")
      if (base.exists()) {
        java.nio.file.Files.walk(base.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
      val stage = s"$base/stage"; val sink = s"$base/sink"
      val ckpt = s"$base/ckpt"
      val ev = Tables.load(s, dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      val bounds = ev.agg(min("ts"), max("ts")).first()
      import java.time.temporal.ChronoUnit
      val minHour = bounds.getTimestamp(0).toInstant.truncatedTo(ChronoUnit.HOURS)
      val maxTs = bounds.getTimestamp(1).toInstant
      val cut = java.sql.Timestamp.from(minHour.plus(24, ChronoUnit.HOURS))
      val lastRealWindowStartUs =
        maxTs.truncatedTo(ChronoUnit.HOURS).toEpochMilli * 1000L
      def drain(): Unit = {
        val q = s.readStream.schema(ev.schema).parquet(stage)
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(12, 2))).as("total_dec"))
          .writeStream.format("parquet").option("path", sink)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      ev.filter(col("ts") >= lit(cut)).write.mode("append").parquet(stage)
      drain()
      ev.filter(col("ts") < lit(cut)).write.mode("append").parquet(stage)
      drain()
      // r16: ONE +10h sentinel drain replaces the former two (+10/+20):
      // within a single AvailableNow run the engine keeps executing
      // no-data batches while watermark advancement can still finalize
      // windows, which already covers the one-batch emission lag the
      // second sentinel round was re-buying with a full restart.
      // Verified hash-identical vs the oracle at sf0.001/0.01/0.1.
      ev.orderBy(col("ts").desc).limit(1)
        .withColumn("ts", col("ts") + expr("INTERVAL 10 HOURS"))
        .write.mode("append").parquet(stage)
      drain()
      s.read.parquet(sink)
        .select(unix_micros(col("window.start")).as("window_start_us"),
          col("n"), col("total_dec").cast("double").as("total_value"))
        .filter(col("window_start_us") <= lastRealWindowStartUs)
        .orderBy("window_start_us")
    } finally s.conf.set("spark.sql.shuffle.partitions", savedParts)
  }

  /** Watermarked stream-stream LEFT OUTER join (q125 covers inner):
    * views with no purchase by the same user in the following hour must
    * be emitted WITH NULLS, exactly once, and only after the watermark
    * passes the end of their join window — the semantics that let a
    * 100 TB abandonment/attribution pipeline run as one streaming job
    * instead of a nightly batch anti-join. Matches emit per micro-batch;
    * null-side rows wait on the MIN of the two stream watermarks, so the
    * far-future sentinels advance BOTH sides (a view-only sentinel would
    * hold back the purchase watermark and nothing would flush). One
    * sentinel-pair drain suffices — no-data batches cover the
    * one-batch emission lag (q189 pattern).
    * The oracle is the batch LEFT JOIN: equality proves every unmatched
    * view flushed exactly once and no match was lost or duplicated. */
  private val q190 = Q(
    "q190_stream_outer_join",
    """WITH v AS (SELECT user_id, date_trunc('microseconds', ts) AS ts
      |           FROM events WHERE event_type = 'view'),
      |p AS (SELECT user_id, date_trunc('microseconds', ts) AS ts
      |      FROM events WHERE event_type = 'purchase')
      |SELECT v.user_id AS user_id,
      |  count(p.user_id) AS n_matched,
      |  count(*) FILTER (WHERE p.user_id IS NULL) AS n_unmatched
      |FROM v LEFT JOIN p
      |  ON v.user_id = p.user_id
      |  AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    s.conf.set("spark.sql.streaming.schemaInference", "false")
    val savedParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val base = new java.io.File(s"/tmp/graft_q190_${math.abs(dir.hashCode)}")
      if (base.exists()) {
        java.nio.file.Files.walk(base.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
      val stage = s"$base/stage"; val sink = s"$base/sink"
      val ckpt = s"$base/ckpt"
      val ev = Tables.load(s, dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      val maxRealTs = ev.agg(max("ts")).first().getTimestamp(0)
      def drain(): Unit = {
        def src = s.readStream.schema(ev.schema).parquet(stage)
        val views = src.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
          .withWatermark("v_ts", "1 hour")
        val purchases = src.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
          .withWatermark("p_ts", "1 hour")
        val q = views.join(purchases,
          expr("""v_user = p_user AND
                 |p_ts >= v_ts AND p_ts <= v_ts + INTERVAL 1 HOUR""".stripMargin),
          "leftOuter")
          .writeStream.format("parquet").option("path", sink)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      ev.write.mode("append").parquet(stage)
      drain()
      // Sentinels must sit past the GLOBAL max ts on BOTH streams: a
      // per-type max would leave the purchase watermark behind whenever
      // the last real purchase precedes the last view (the adversarial
      // corpus has exactly that shape), and the min-of-watermarks rule
      // would then never flush the final views' null rows.
      // r16: ONE sentinel pair round (+10h) replaces the former two —
      // AvailableNow's no-data batches cover the one-batch emission lag
      // (q189 note); the pair is derived once, both types in one append.
      val lastRow = ev.orderBy(col("ts").desc).limit(1)
        .withColumn("ts", col("ts") + expr("INTERVAL 10 HOURS"))
        .localCheckpoint()
      Seq("view", "purchase").map(t =>
          lastRow.withColumn("event_type", lit(t)))
        .reduce(_.unionAll(_))
        .write.mode("append").parquet(stage)
      drain()
      s.read.parquet(sink)
        .filter(col("v_ts") <= lit(maxRealTs))
        .groupBy(col("v_user").as("user_id"))
        .agg(count(col("p_user")).as("n_matched"),
          count(when(col("p_user").isNull, 1)).as("n_unmatched"))
        .orderBy("user_id")
    } finally s.conf.set("spark.sql.shuffle.partitions", savedParts)
  }

  val defs: Seq[Q] =
    Seq(q70, q71, q72s, q117, q118, q125, q153, q160, q170, q176, q189, q190)
}
