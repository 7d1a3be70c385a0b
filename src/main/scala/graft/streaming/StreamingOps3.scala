package graft.streaming

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Round-9 streaming additions, part 3:
  *
  *  - q311 streaming drift gate: the q278 chi-square computed from a
  *    STREAMING windowed contingency table — per event-day, how far
  *    that day's event-type mix diverges from the corpus-wide mix.
  *    The production shape: the stream maintains the (day × type)
  *    counts incrementally (bounded state: days × types), the
  *    statistic re-derives from those counts at read time, and an
  *    alert is a day whose chi-square contribution spikes.
  */
object StreamingOps3 {

  /** Per-day drift: stream aggregates count(day, type) — the ONLY
    * stateful op, state = one long per (day, type) cell — then the
    * tiny materialized cell table gets the exact q278 arithmetic:
    * expected = r*c/n from the same snapshot, per-cell term quantized
    * to integer micros BEFORE summing (order-free bigint fold), per-day
    * chi2 = sum of its cells' terms. The oracle replays the identical
    * math from a batch scan — streaming-incremental counts must land
    * byte-identical. */
  private val q311 = Q(
    "q311_stream_drift_gate",
    """WITH obs AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d, event_type,
      |    CAST(count(*) AS BIGINT) AS o
      |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
      |tot AS (
      |  SELECT d, event_type, o,
      |    SUM(o) OVER (PARTITION BY d) AS r,
      |    SUM(o) OVER (PARTITION BY event_type) AS c,
      |    SUM(o) OVER () AS n
      |  FROM obs)
      |SELECT d, CAST(count(*) AS BIGINT) AS n_types,
      |  CAST(max(r) AS BIGINT) AS day_events,
      |  CAST(SUM(CAST(round(CAST(o*n - r*c AS DOUBLE) * CAST(o*n - r*c AS DOUBLE)
      |    / (CAST(r AS DOUBLE)*c*n) * 1000000) AS BIGINT)) AS BIGINT)
      |    AS chi2_micro
      |FROM tot GROUP BY d ORDER BY d""".stripMargin) { (s, dir) =>
    val savedParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_q311_ckpt").toString
      val q = Tables.eventsStream(s, dir)
        .filter(col("ts").isNotNull)
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("o"))
        .select(col("window.start").cast("date").as("d"),
          col("event_type"), col("o"))
        .writeStream.format("memory").queryName("graft_q311")
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // the statistic re-derives from the day×type cell snapshot
      val w = org.apache.spark.sql.expressions.Window
      s.table("graft_q311")
        .withColumn("r", sum("o").over(w.partitionBy("d")))
        .withColumn("c", sum("o").over(w.partitionBy("event_type")))
        .withColumn("n", sum("o").over(w.partitionBy()))
        .withColumn("term_micro", expr(
          """CAST(round(CAST(o*n - r*c AS DOUBLE) * CAST(o*n - r*c AS DOUBLE)
            |  / (CAST(r AS DOUBLE)*c*n) * 1000000) AS BIGINT)""".stripMargin))
        .groupBy("d")
        .agg(count(lit(1)).as("n_types"),
          max("r").cast("long").as("day_events"),
          sum("term_micro").cast("long").as("chi2_micro"))
        .orderBy("d")
    } finally s.conf.set("spark.sql.shuffle.partitions", savedParts)
  }

  // ------------- q337: streaming funnel pattern automaton

  /** The q324 funnel regex `v[cv]*p` run as a STREAMING automaton:
    * state per (user, day) is just (automaton phase, match count,
    * sequence length) — O(1) per key however long the stream — and the
    * pattern's repeated class excludes its terminator, so the two-phase
    * DFA below is exactly the regex's non-overlapping leftmost scan.
    * Rows inside a batch are sorted by (event-time, event_id) before
    * feeding the DFA; the phase carries across micro-batches. Emits the
    * running totals per batch with a monotone seen-counter (Update-mode
    * shape; the final row per key is the answer — the q207 pattern). */
  private[graft] class FunnelProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      (Long, Int), (Long, Int, Long, Long, String),
      (Long, Int, Long, Long, Long)] {
    import org.apache.spark.sql.streaming.{OutputMode, TTLConfig, TimeMode,
      TimerValues, ValueState}
    // (phase 0|1, n_matches, seq_len, emissions)
    @transient private var st: ValueState[(Int, Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      import implicits._
      st = getHandle.getValueState[(Int, Long, Long, Long)]("funnel",
        implicitly[org.apache.spark.sql.Encoder[(Int, Long, Long, Long)]],
        TTLConfig.NONE)
    }

    override def handleInputRows(
        key: (Long, Int),
        rows: Iterator[(Long, Int, Long, Long, String)],
        timerValues: TimerValues): Iterator[(Long, Int, Long, Long, Long)] = {
      var (phase, n, len, emits) =
        if (st.exists()) st.get() else (0, 0L, 0L, 0L)
      rows.toSeq.sortBy(r => (r._3, r._4)).foreach { r =>
        val c = r._5
        len += 1
        phase = (phase, c) match {
          case (0, "v") => 1
          case (0, _) => 0
          case (1, "p") => n += 1; 0
          case (1, "c") | (1, "v") => 1
          case (1, _) => 0
        }
      }
      emits += 1
      st.update((phase, n, len, emits))
      Iterator.single((key._1, key._2, len, n, emits))
    }
  }

  /** Streaming MATCH_RECOGNIZE-lite: q324's per-(user, day) funnel
    * counts from a constant-state streaming automaton instead of a
    * batch regex over the materialized sequence. Oracle: the q324
    * formulation minus the match text. */
  private val q337 = Q(
    "q337_stream_funnel_automaton",
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id,
      |    substr(event_type, 1, 1) AS c
      |  FROM events
      |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |    AND event_type IS NOT NULL),
      |sq AS (
      |  SELECT user_id, day,
      |    string_agg(c, '' ORDER BY ts, event_id) AS seq
      |  FROM e GROUP BY 1, 2)
      |SELECT user_id, day, CAST(length(seq) AS BIGINT) AS seq_len,
      |  CAST(len(regexp_split_to_array(seq, 'v[cv]*p')) - 1 AS BIGINT)
      |    AS n_funnels
      |FROM sq ORDER BY user_id, day""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val sinkName = StreamingOps.uniqueSink("graft_q337_sink")
    val savedParts = s.conf.get("spark.sql.shuffle.partitions")
    val savedProvider = s.conf.get(
      "spark.sql.streaming.stateStore.providerClass", "")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_q337_ckpt").toString
      val query = Tables.eventsStream(s, dir)
        .filter(col("user_id").isNotNull && col("ts").isNotNull &&
          col("event_type").isNotNull)
        .select(col("user_id"),
          datediff(to_date(col("ts")), lit("1970-01-01")).as("epday"),
          expr("unix_micros(ts)").as("us"), col("event_id"),
          substring(col("event_type"), 1, 1).as("c"))
        .as[(Long, Int, Long, Long, String)]
        .groupByKey(r => (r._1, r._2))
        .transformWithState(new FunnelProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "epday", "seq_len", "n_funnels", "emits")
        .writeStream.format("memory").queryName(sinkName)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "epday").orderBy(col("emits").desc)
      s.table(sinkName)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"),
          expr("date_add('1970-01-01', epday)").as("day"),
          col("seq_len").cast("long").as("seq_len"),
          col("n_funnels").cast("long").as("n_funnels"))
        .orderBy("user_id", "day")
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", savedParts)
      if (savedProvider.nonEmpty)
        s.conf.set("spark.sql.streaming.stateStore.providerClass",
          savedProvider)
      else s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  val defs: Seq[Q] = Seq(q311, q337)
}
