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

  val defs: Seq[Q] = Seq(q311)
}
