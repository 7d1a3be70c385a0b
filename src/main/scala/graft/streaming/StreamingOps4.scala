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

  // ------------- q400: streaming near-dup dedup with persistent LSH state

  private[graft] case class BandRow(
      doc_id: Long, hs: Seq[Long], band: Int, bsig: Long)

  /** Stateful LSH-bucket processor: per (band, band-signature) bucket
    * the ListState holds every (doc_id, sorted shingle-hash set) member
    * seen across ALL micro-batches — the persistent index of a
    * streaming dedup service (8-byte hashed elements, not strings —
    * see [[graft.operators.TextOps.bandedSigsWithSets]] for the state-
    * size math and the negligible collision bound). A new document is
    * exactly Jaccard-verified against every stored member of each
    * bucket it lands in (the q45/q146 verify step moved INSIDE the
    * state layer: candidates never leave the executor), emitting
    * (doc, earliest matching prior) on a hit.
    * Within one micro-batch, rows are processed in doc_id order so
    * same-batch winners are deterministic. State is bucket-bounded
    * exactly like q45's band buckets; at 100 TB it's keyed RocksDB
    * state, and a TTL (not set here — restarts must dedup against the
    * full history) would bound it for windowed-freshness contracts. */
  private[graft] class LshDedupProcessor(threshold: Double)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      (Int, Long), BandRow, (Long, Long)] {
    @transient private var members: org.apache.spark.sql.streaming.ListState[(Long, Array[Long])] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      import implicits._
      members = getHandle.getListState[(Long, Array[Long])](
        "members",
        implicitly[org.apache.spark.sql.Encoder[(Long, Array[Long])]],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    /** Exact Jaccard over two SORTED distinct-hash arrays (two-pointer
      * intersection — no per-pair allocation in the state hot path). */
    private def jaccard(a: Array[Long], b: Array[Long]): Double = {
      var i = 0; var j = 0; var inter = 0
      while (i < a.length && j < b.length) {
        if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
        else if (a(i) < b(j)) i += 1
        else j += 1
      }
      inter.toDouble / (a.length + b.length - inter)
    }

    override def handleInputRows(
        key: (Int, Long),
        rows: Iterator[BandRow],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[(Long, Long)] = {
      val prior = members.get().toSeq
      val out = Seq.newBuilder[(Long, Long)]
      val added = Seq.newBuilder[(Long, Array[Long])]
      var pool = prior
      rows.toSeq.sortBy(_.doc_id).foreach { r =>
        val mine = r.hs.toArray
        val hits = pool.iterator
          .filter { case (e, ehs) =>
            e != r.doc_id && jaccard(ehs, mine) >= threshold }
          .map(_._1)
        if (hits.nonEmpty) out += ((r.doc_id, hits.min))
        pool = pool :+ (r.doc_id -> mine)
        added += (r.doc_id -> mine)
      }
      added.result().foreach(members.appendValue)
      out.result().iterator
    }
  }

  /** Streaming near-dup dedup with PERSISTENT LSH state — the
    * streaming twin of q45 (banded MinHash) and q146 (incremental
    * gate): the corpus batch commits first and a second drain (same
    * checkpoint — an exactly-once RESTART, the q170/q397 pattern)
    * brings the increment; every document is flagged with the earliest
    * prior document whose exact Jaccard clears 0.9 among its
    * band-bucket peers. The oracle replays shingle-sharing pairs with
    * the same (batch, doc_id) arrival order; band-candidate vs
    * shingle-candidate equality is q45/q146's documented accepted risk
    * (engineered near-dup pairs sit clearly above the threshold; miss
    * probability ~4e-8 per pair). */
  private val q400 = Q(
    "q400_stream_lsh_dedup",
    s"""WITH ${graft.operators.TextOps.Sh3OracleCte},
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
       |pairs AS (
       |  SELECT a.doc_id AS e, b.doc_id AS d, COUNT(*) AS inter
       |  FROM sh a JOIN sh b ON a.g = b.g
       |  WHERE (CASE WHEN a.doc_id % 5 = 4 THEN 2 ELSE 1 END
       |         < CASE WHEN b.doc_id % 5 = 4 THEN 2 ELSE 1 END)
       |     OR (a.doc_id % 5 = 4) = (b.doc_id % 5 = 4)
       |        AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT d AS doc_id, min(e) AS dup_of
       |FROM pairs
       |JOIN sizes si ON si.doc_id = e
       |JOIN sizes sd ON sd.doc_id = d
       |WHERE CAST(inter AS DOUBLE) / (si.n + sd.n - inter) >= 0.9
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
    val savedParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = new java.io.File(s"/tmp/graft_q400_${math.abs(dir.hashCode)}")
      if (base.exists()) {
        java.nio.file.Files.walk(base.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
      val stage = s"$base/stage"; val ckpt = s"$base/ckpt"
      val outSink = s"$base/sink" // parquet: checkpoint-recoverable (memory isn't)
      graft.functions.GraftFunctions.register(s)
      val d = Tables.load(s, dir, "documents").select("doc_id", "text")
      def stageBatch(pred: org.apache.spark.sql.Column): Unit =
        d.filter(pred).coalesce(1).write.mode("append").parquet(stage)
      def drain(): Unit = {
        val docsets = s.readStream.schema(d.schema).parquet(stage)
          .select(col("doc_id"), expr("graft_shingles3(text)").as("gs"))
          .filter(size(col("gs")) > 0)
        val banded = graft.operators.TextOps.bandedSigsWithSets(s, docsets)
          .as[BandRow]
        val q = banded.groupByKey(r => (r.band, r.bsig))
          .transformWithState(new LshDedupProcessor(0.9),
            TimeMode.None(), OutputMode.Append())
          .toDF("doc_id", "dup_of")
          .writeStream.format("parquet").option("path", outSink)
          .outputMode("append").trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ckpt).start()
        q.awaitTermination()
      }
      // corpus first, then the increment through a RESTARTED query on
      // the same checkpoint — the state survives, nothing re-processes
      stageBatch(col("doc_id") % 5 < 4); drain()
      stageBatch(col("doc_id") % 5 === 4); drain()
      s.read.schema("doc_id LONG, dup_of LONG").parquet(outSink)
        .groupBy("doc_id").agg(min("dup_of").as("dup_of"))
        .select(col("doc_id").cast("long"), col("dup_of").cast("long"))
        .orderBy("doc_id")
    } finally s.conf.set("spark.sql.shuffle.partitions", savedParts)
  }

  // ------------- q406: stream-static SCD2 enrichment at event time

  /** q406: every event enriched with the dimension version valid AT ITS
    * EVENT TIME — the stream-static SCD2 join (q333's point-in-time
    * batch join moved into the stream, q174's SCD2 dimension as the
    * static side). The dimension is a broadcast range join
    * (bucket equality + ts ∈ [valid_from, valid_to)): stateless, so at
    * 100 TB the stream side never keys state and the dim rides along as
    * a broadcast — the standard streaming-enrichment shape. The fixture
    * dimension has two deterministic epochs split at the corpus's
    * mid-timestamp (tier rotates at the cutover), so the oracle replays
    * the join exactly; outputs are pure integers. */
  private val q406 = Q(
    "q406_stream_scd2_enrich",
    """WITH b AS (
      |  SELECT CAST(min(epoch_us(date_trunc('microseconds', ts))) AS BIGINT) AS lo,
      |         CAST(max(epoch_us(date_trunc('microseconds', ts))) AS BIGINT) AS hi
      |  FROM events),
      |bk AS (SELECT unnest(range(0, 10)) AS bucket),
      |dim AS (
      |  SELECT bucket, CAST(bucket % 3 AS INT) AS tier,
      |    CAST(-4611686018427387904 AS BIGINT) AS vfrom,
      |    (SELECT (lo + hi) // 2 FROM b) AS vto
      |  FROM bk
      |  UNION ALL
      |  SELECT bucket, CAST((bucket + 1) % 3 AS INT) AS tier,
      |    (SELECT (lo + hi) // 2 FROM b) AS vfrom,
      |    CAST(4611686018427387904 AS BIGINT) AS vto
      |  FROM bk),
      |e AS (
      |  SELECT ((user_id % 10) + 10) % 10 AS bucket,
      |    epoch_us(date_trunc('microseconds', ts)) AS us,
      |    ((user_id % 1000003) + 1000003) % 1000003 AS uk
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
      |SELECT d.tier AS tier, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(e.uk) AS BIGINT) AS sum_uk,
      |  CAST(count(DISTINCT e.bucket) AS BIGINT) AS n_buckets
      |FROM e JOIN dim d
      |  ON d.bucket = e.bucket AND e.us >= d.vfrom AND e.us < d.vto
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val base = new java.io.File(s"/tmp/graft_q406_${math.abs(dir.hashCode)}")
    if (base.exists()) {
      java.nio.file.Files.walk(base.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    val stage = s"$base/stage"; val ckpt = s"$base/ckpt"
    val outSink = s"$base/sink"
    val ev = Tables.load(s, dir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("ts"))
    val Array(lo, hi) = ev
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .first() match { case r => Array(r.getLong(0), r.getLong(1)) }
    val mid = Math.floorDiv(lo + hi, 2L) // DuckDB // floors too
    val half = 4611686018427387904L // 2^62: clear of any real timestamp
    val dim = (0 until 10).flatMap { b =>
      Seq((b.toLong, b % 3, -half, mid), (b.toLong, (b + 1) % 3, mid, half))
    }.toDF("dbucket", "tier", "vfrom", "vto")
    ev.write.mode("append").parquet(stage)
    val q = s.readStream.schema(ev.schema).parquet(stage)
      .select(
        expr("((user_id % 10) + 10) % 10").as("bucket"),
        unix_micros(col("ts")).as("us"),
        expr("((user_id % 1000003) + 1000003) % 1000003").as("uk"))
      // stream-static SCD2 range join: broadcast dim, stateless stream
      .join(broadcast(dim),
        col("bucket") === col("dbucket") &&
          col("us") >= col("vfrom") && col("us") < col("vto"))
      .select("tier", "bucket", "uk")
      .writeStream.format("parquet").option("path", outSink)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.read.schema("tier INT, bucket LONG, uk LONG").parquet(outSink)
      .groupBy("tier")
      .agg(count(lit(1)).as("n_events"),
        sum(col("uk")).cast("long").as("sum_uk"),
        countDistinct(col("bucket")).cast("long").as("n_buckets"))
      .orderBy("tier")
  }

  /** DuckDB replay of the codegen PolyHash fold (mod at every step
    * keeps intermediates < 2^36 — the cross-engine int128 rule). */
  private def duckPoly(g: String): String =
    s"""list_reduce(list_prepend(CAST(29 AS BIGINT),
       |    list_transform(range(1, length($g) + 1),
       |                   i -> CAST(ord(substring($g, i, 1)) AS BIGINT))),
       |  (acc, c) -> (acc * 33 + c) % 2147483647)""".stripMargin

  /** q410: STREAMING decontamination gate — the stream twin of q131's
    * batch eval-set filter, the shape a live ingestion pipeline runs:
    * training documents arrive as a stream and only documents sharing
    * NO word-5-gram with the benchmark set (doc_id % 10 = 7, the q131
    * convention) are emitted — first-seen-clean, exactly once.
    *
    * Scale design: the eval-set gram hashes are BOUNDED (benchmarks
    * are small by nature), so they ride along as a sorted driver-side
    * array probed by a codegen binary search per document
    * ([[graft.functions.AnyInSortedSet]]) — the stream stays STATELESS
    * (no state store, no shuffle, no watermark; a 100 TB/day feed is
    * one codegen projection + filter). Hashing is the shared PolyHash
    * fold, computed identically in both engines, so even a collision
    * (which would contaminate a clean doc) is bit-reproducible.
    * Restart exactly-once: two AvailableNow drains on ONE checkpoint
    * with the second half of the corpus staged between them; the final
    * counts match the oracle only if every doc was emitted exactly
    * once. */
  private val q410 = Q(
    "q410_stream_decontamination",
    s"""WITH tok AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, greatest(len(ws) - 3, 1)),
       |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
       |         ws[i+3] || ' ' || ws[i+4]))) AS g
       |  FROM tok WHERE len(ws) >= 5),
       |hh AS MATERIALIZED (
       |  SELECT doc_id, ${duckPoly("g")} AS h FROM sh),
       |bench AS (SELECT DISTINCT h FROM hh WHERE doc_id % 10 = 7),
       |contam AS MATERIALIZED (
       |  SELECT DISTINCT t.doc_id FROM hh t JOIN bench b ON b.h = t.h
       |  WHERE t.doc_id % 10 <> 7),
       |train AS (SELECT doc_id FROM documents WHERE doc_id % 10 <> 7),
       |clean AS (SELECT doc_id FROM train
       |          WHERE doc_id NOT IN (SELECT doc_id FROM contam))
       |SELECT 'clean' AS which, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(COALESCE(sum(doc_id), 0) AS BIGINT) AS sum_doc_id FROM clean
       |UNION ALL
       |SELECT 'contam', CAST(count(*) AS BIGINT),
       |  CAST(COALESCE(sum(doc_id), 0) AS BIGINT) FROM contam
       |ORDER BY which""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.graftbridge.Bridge
    graft.functions.GraftFunctions.register(s)
    val base = new java.io.File(s"/tmp/graft_q410_${math.abs(dir.hashCode)}")
    if (base.exists()) {
      java.nio.file.Files.walk(base.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    val stage = s"$base/stage"; val ckpt = s"$base/ckpt"
    val outSink = s"$base/sink"
    val docs = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
    val hashExpr =
      "transform(graft_shingles5(text), g -> graft_polyhash(g, 29, 33, 2147483647))"
    // benchmark gram hashes: eval sets are small by nature — sorted
    // driver metadata, the k-means-centroid contract
    val bench = docs.filter(col("doc_id") % 10 === 7)
      .select(explode(expr(hashExpr)).as("h")).distinct()
      .collect().map(_.getLong(0)).sorted
    val train = docs.filter(col("doc_id") % 10 =!= 7)
    def drain(): Unit = {
      val st = s.readStream.schema(train.schema).parquet(stage)
      // NULL text / < 5 tokens → no grams → clean (coalesce keeps them)
      val flagged =
        if (bench.isEmpty) st.withColumn("contam", lit(false))
        else st.withColumn("contam", coalesce(
          Bridge.column(graft.functions.AnyInSortedSet(
            Bridge.expr(expr(hashExpr)), bench)), lit(false)))
      val q = flagged.filter(!col("contam")).select("doc_id")
        .writeStream.format("parquet").option("path", outSink)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    train.filter(col("doc_id") % 2 === 0).write.mode("append").parquet(stage)
    drain()
    train.filter(col("doc_id") % 2 === 1).write.mode("append").parquet(stage)
    drain() // same checkpoint: only the new half may emit
    val cleanAgg = s.read.schema("doc_id LONG").parquet(outSink)
      .agg(count(lit(1)).cast("long").as("n"),
        coalesce(sum(col("doc_id")), lit(0L)).cast("long").as("sd")).first()
    val trainAgg = train
      .agg(count(lit(1)).cast("long").as("n"),
        coalesce(sum(col("doc_id")), lit(0L)).cast("long").as("sd")).first()
    import s.implicits._
    Seq(
      ("clean", cleanAgg.getLong(0), cleanAgg.getLong(1)),
      ("contam", trainAgg.getLong(0) - cleanAgg.getLong(0),
        trainAgg.getLong(1) - cleanAgg.getLong(1)))
      .toDF("which", "n_docs", "sum_doc_id")
      .orderBy("which")
  }

  /** q417: the manifest connector as an exactly-once STREAMING SINK —
    * the write half of the streaming loop (q397 tails it as a source).
    * Each micro-batch commits as ONE manifest version through the
    * sink's own lock protocol, and the manifest records the last
    * committed epoch per query (`streamEpochs`), which is what makes a
    * post-failure replay safe: Spark re-runs the last un-checkpointed
    * batch and re-invokes commit for an epoch the table already has —
    * the sink drops the replay's files and publishes nothing.
    *
    * The fixture drives all three legs: (1) two AvailableNow drains on
    * one checkpoint (restart continuation — only the new half commits),
    * (2) a FORCED replay — the checkpoint's last commit marker is
    * deleted, so the restarted query re-executes the final batch
    * against a table that already holds its rows; the epoch guard must
    * swallow it (row counts prove it), and (3) version accounting —
    * exactly one manifest version per committed epoch, none for the
    * replay. At 100 TB this is a live ingestion feed writing a queryable
    * snapshot-isolated table with no duplicate-on-crash window. */
  private val q417 = Q(
    "q417_manifest_stream_sink",
    """WITH d AS (
      |  SELECT doc_id FROM documents WHERE doc_id IS NOT NULL)
      |SELECT 'last_epoch' AS which, CAST(1 AS BIGINT) AS n,
      |  CAST(0 AS BIGINT) AS sum_doc_id
      |UNION ALL
      |SELECT 'replay_rows', CAST(count(*) AS BIGINT),
      |  CAST(sum(doc_id) AS BIGINT) FROM d
      |UNION ALL SELECT 'replay_versions', CAST(2 AS BIGINT), CAST(0 AS BIGINT)
      |UNION ALL
      |SELECT 'rows', CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT)
      |FROM d
      |UNION ALL SELECT 'versions', CAST(2 AS BIGINT), CAST(0 AS BIGINT)
      |ORDER BY which""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.streaming.Trigger
    val base = new java.io.File(s"/tmp/graft_q417_${math.abs(dir.hashCode)}")
    if (base.exists()) {
      java.nio.file.Files.walk(base.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    val stage = s"$base/stage"; val ckpt = s"$base/ckpt"
    val out = s"$base/table"
    val docs = Tables.load(s, dir, "documents")
      .filter(col("doc_id").isNotNull).select(col("doc_id"))
    def drain(): Unit = {
      val q = s.readStream.schema(docs.schema).parquet(stage)
        .writeStream.format("graft.sources.ManifestSink")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(stage)
    drain() // epoch 0 -> manifest v1
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(stage)
    drain() // restart on the same checkpoint: epoch 1 -> v2 only
    def readBack() = s.read.format("graft.sources.ManifestSource")
      .schema("doc_id LONG").option("path", out).load()
      .agg(count(lit(1)).cast("long"),
        coalesce(sum(col("doc_id")), lit(0L)).cast("long")).first()
    val afterTwo = readBack()
    val versions = graft.sources.ManifestRead.latestVersion(out)
    val lastEpoch = graft.sources.ManifestRead.streamEpochs(
      graft.sources.ManifestRead.manifestText(out, "manifest.json"))
      .values.max
    // FORCED REPLAY: drop the checkpoint's last commit marker so the
    // restarted query re-executes the final batch against a table that
    // already holds its rows — the epoch guard must swallow it
    val commitDir = new java.io.File(s"$ckpt/commits")
    val last = commitDir.listFiles().map(_.getName)
      .filter(_.forall(_.isDigit)).map(_.toLong).max
    new java.io.File(commitDir, last.toString).delete()
    new java.io.File(commitDir, s".$last.crc").delete() // local-FS sidecar
    drain()
    val afterReplay = readBack()
    val versionsReplay = graft.sources.ManifestRead.latestVersion(out)
    import s.implicits._
    Seq(
      ("rows", afterTwo.getLong(0), afterTwo.getLong(1)),
      ("versions", versions, 0L),
      ("last_epoch", lastEpoch, 0L),
      ("replay_rows", afterReplay.getLong(0), afterReplay.getLong(1)),
      ("replay_versions", versionsReplay, 0L))
      .toDF("which", "n", "sum_doc_id")
      .orderBy("which")
  }

  /** q419: STREAMING CDC APPLY — a change stream merged into the
    * manifest table exactly-once (the "apply changes into" /
    * merge-a-CDC-feed-into-Delta shape): foreachBatch calls the
    * connector's UPSERT with (ledgerKey, batchId), and the manifest's
    * `streamEpochs` ledger (q417's mechanism, extended to the DML verb)
    * makes a post-failure replay of an applied batch a no-op — checked
    * UNDER the commit lock, before the staleness guard, because a
    * replay's scan positions are legitimately stale against the
    * post-commit state. Each applied batch is ONE atomic manifest
    * version: matched keys supersede via delete vectors, new keys
    * insert; no data file rewritten.
    *
    * Fixture: initial table (batch append, v1), two update waves
    * drained on one checkpoint (restart continuation, v2/v3), then a
    * FORCED replay of the last wave (checkpoint commit marker deleted)
    * which must change neither rows nor version count. */
  private val q419 = Q(
    "q419_manifest_cdc_apply",
    """WITH n AS (
      |  SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS v FROM nation
      |  WHERE n_nationkey IS NOT NULL),
      |up AS (
      |  SELECT k, 'A' || CAST(k AS VARCHAR) AS v FROM n WHERE k % 3 = 0
      |  UNION ALL
      |  SELECT k, 'B' || CAST(k AS VARCHAR) AS v FROM n WHERE k % 3 = 1
      |  UNION ALL
      |  SELECT k + 500, 'N' || CAST(k + 500 AS VARCHAR) FROM n WHERE k < 4),
      |fin AS (
      |  SELECT n.k, COALESCE(u.v, n.v) AS v
      |  FROM n LEFT JOIN up u ON u.k = n.k
      |  UNION ALL
      |  SELECT k, v FROM up WHERE k NOT IN (SELECT k FROM n))
      |SELECT 'applied' AS which, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(k) AS BIGINT) AS sum_k FROM fin
      |UNION ALL
      |SELECT 'replay', CAST(count(*) AS BIGINT), CAST(sum(k) AS BIGINT)
      |FROM fin
      |UNION ALL SELECT 'replay_versions', CAST(3 AS BIGINT), CAST(0 AS BIGINT)
      |UNION ALL
      |SELECT 'updated', CAST(count(*) AS BIGINT), CAST(sum(k) AS BIGINT)
      |FROM fin WHERE v <> (SELECT max(n2.v) FROM n n2 WHERE n2.k = fin.k)
      |  OR fin.k NOT IN (SELECT k FROM n)
      |UNION ALL SELECT 'versions', CAST(3 AS BIGINT), CAST(0 AS BIGINT)
      |ORDER BY which""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.streaming.Trigger
    val base = new java.io.File(s"/tmp/graft_q419_${math.abs(dir.hashCode)}")
    if (base.exists()) {
      java.nio.file.Files.walk(base.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    val stage = s"$base/stage"; val ckpt = s"$base/ckpt"
    val out = s"$base/table"
    val ddl = "k LONG, v STRING"
    val nat = Tables.load(s, dir, "nation")
      .filter(col("n_nationkey").isNotNull)
      .select(col("n_nationkey").cast("long").as("k"),
        col("n_name").as("v"))
    nat.coalesce(1).write.format("graft.sources.ManifestSink")
      .option("path", out).mode("append").save() // v1: the initial table
    def drain(): Unit = {
      val q = s.readStream.schema("k LONG, v STRING").parquet(stage)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          graft.sources.ManifestMaintenance.upsert(
            s, out, ddl, Seq("k"), batch, epoch = Some(("q419-cdc", id)))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // wave 1: update every k%3=0 + insert 4 new keys
    nat.filter(col("k") % 3 === 0)
      .select(col("k"), concat(lit("A"), col("k").cast("string")).as("v"))
      .unionByName(nat.filter(col("k") < 4)
        .select((col("k") + 500).as("k"),
          concat(lit("N"), (col("k") + 500).cast("string")).as("v")))
      .coalesce(1).write.mode("append").parquet(stage)
    drain() // v2
    // wave 2 (restart on the same checkpoint): update every k%3=1
    nat.filter(col("k") % 3 === 1)
      .select(col("k"), concat(lit("B"), col("k").cast("string")).as("v"))
      .coalesce(1).write.mode("append").parquet(stage)
    drain() // v3
    def readBack() = s.read.format("graft.sources.ManifestSource")
      .schema(ddl).option("path", out).load()
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)).cast("long"),
        coalesce(sum(col("k")), lit(0L)).cast("long")).first()
    val applied = agg(readBack())
    val updated = agg(readBack().filter(
      col("v") === concat(lit("A"), col("k").cast("string")) ||
        col("v") === concat(lit("B"), col("k").cast("string")) ||
        col("v") === concat(lit("N"), col("k").cast("string"))))
    val versions = graft.sources.ManifestRead.latestVersion(out)
    // FORCED REPLAY of the last applied wave: the epoch guard must
    // swallow the duplicate upsert
    val commitDir = new java.io.File(s"$ckpt/commits")
    val last = commitDir.listFiles().map(_.getName)
      .filter(_.forall(_.isDigit)).map(_.toLong).max
    new java.io.File(commitDir, last.toString).delete()
    new java.io.File(commitDir, s".$last.crc").delete()
    drain()
    val replay = agg(readBack())
    val versionsReplay = graft.sources.ManifestRead.latestVersion(out)
    import s.implicits._
    Seq(
      ("applied", applied.getLong(0), applied.getLong(1)),
      ("updated", updated.getLong(0), updated.getLong(1)),
      ("versions", versions, 0L),
      ("replay", replay.getLong(0), replay.getLong(1)),
      ("replay_versions", versionsReplay, 0L))
      .toDF("which", "n_rows", "sum_k")
      .orderBy("which")
  }

  val defs: Seq[Q] = Seq(q357, q372, q400, q406, q410, q417, q419)
}
