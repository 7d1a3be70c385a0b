package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat media as opaque `binary` columns
  * with typed metadata, decoded in BATCHES via a typed
  * `Dataset.mapPartitions` (the Scala analog of `mapInPandas` batch
  * processing: one decoder init per partition, records processed in
  * groups).
  *
  * The decoder itself is a clearly-marked deterministic STUB (no image/
  * audio libs in this container — builder prompt): it derives fake
  * width/height/format from the payload bytes, so the Spark-side
  * plumbing — schema, binary encoding, batch shape, partitioning — is
  * real and oracle-testable while the codec is swappable.
  */
object MultimodalOps {

  case class MediaIn(doc_id: Long, payload: Array[Byte])

  /** Render payload BYTES as gray/8 pixels: the first `n` bytes,
    * zero-padded when the payload is shorter. The byte-for-pixel
    * mapping keeps every downstream hash/feature replayable by the
    * byte-list oracle while the payload still travels through the real
    * PNG encode→decode (zlib, filters, chunk CRCs) in between. */
  private[graft] def bytePixels(payload: Array[Byte], n: Int): Array[Byte] = {
    val px = new Array[Byte](n)
    System.arraycopy(payload, 0, px, 0, math.min(payload.length, n))
    px
  }

  /** Like [[bytePixels]] but CYCLICALLY TILED: pixel i = byte (i mod
    * len), so short payloads fill the whole image with text-derived
    * content instead of a zero pad. Hash-style consumers (q258) need
    * this — a shared zero pad makes every short document's blocks
    * identical and the near-dup pair count quadratic in corpus size;
    * tiling keeps hash collisions tied to genuinely similar byte
    * content, so dup groups stay as bounded as the corpus's real text
    * dups. Empty payloads stay all-zero. */
  private[graft] def tiledPixels(payload: Array[Byte], n: Int): Array[Byte] = {
    if (payload.isEmpty) return new Array[Byte](n)
    val px = new Array[Byte](n)
    var i = 0
    while (i < n) { px(i) = payload(i % payload.length); i += 1 }
    px
  }

  // The Spark side operates on UTF-8 BYTES (text cast to binary); the
  // DuckDB oracles must too, or any non-ASCII document diverges. DuckDB
  // has no direct blob-byte accessor, so bytes are read out of
  // hex(encode(text)): byte i = 16*hv(2i-1) + hv(2i) where hv maps a hex
  // digit via strpos('123456789ABCDEF', d) — '0' correctly yields 0.
  private[operators] def byteListCte(table: String = "documents"): String =
    s"""WITH hb AS (
       |  SELECT doc_id, hex(encode(text)) AS hx,
       |    CAST(octet_length(encode(text)) AS INT) AS len
       |  FROM $table),
       |bytes AS (
       |  SELECT doc_id, len,
       |    list_transform(range(1, len + 1),
       |      i -> CAST(strpos('123456789ABCDEF', substring(hx, CAST(2*i-1 AS INT), 1)) * 16
       |             + strpos('123456789ABCDEF', substring(hx, CAST(2*i AS INT), 1)) AS BIGINT)) AS bl
       |  FROM hb)""".stripMargin

  case class HeaderOut(
      doc_id: Long, format: String, width: Int, height: Int,
      channels: Int, bit_depth: Int, n_bytes: Int)

  /** Build a REAL container payload for a document (PNG for even ids,
    * JFIF/JPEG for odd — genuine signatures, IHDR/SOF0, CRC32s — see
    * [[graft.functions.MediaCodecs]]), carrying the text bytes as the
    * opaque body. Deterministic per doc, so the DuckDB oracle can
    * predict every header field arithmetically. */
  private[graft] def buildContainer(doc_id: Long, body: Array[Byte]): Array[Byte] = {
    val d = math.abs(doc_id)
    val w = (d % 640 + 1).toInt
    val h = (d % 480 + 1).toInt
    if (d % 2 == 0) {
      val colorType = (d % 3) match { case 0 => 0; case 1 => 2; case _ => 6 }
      graft.functions.MediaCodecs.wrapPng(w, h, colorType, body)
    } else {
      val nComp = if (d % 3 == 0) 1 else 3
      graft.functions.MediaCodecs.wrapJpeg(w, h, nComp, body)
    }
  }

  /** Oracle-side formulas for the constructed container fields (DuckDB
    * syntax), shared by q50/q51: format, channels, n_bytes.
    * PNG size = 61 + body (sig 8, IHDR 25, tEXt 12+4+body, IEND 12);
    * JPEG size = 36 + 3*nComp + body (SOI, APP0 18, SOF0 10+3n, COM
    * 4+body, EOI). */
  private val fmtSql = "CASE WHEN abs(doc_id) % 2 = 0 THEN 'png' ELSE 'jpeg' END"
  private val chSql =
    """CASE WHEN abs(doc_id) % 2 = 0
      | THEN CASE abs(doc_id) % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END
      | ELSE CASE WHEN abs(doc_id) % 3 = 0 THEN 1 ELSE 3 END END""".stripMargin
  private val nBytesSql =
    s"""CASE WHEN abs(doc_id) % 2 = 0
       | THEN 61 + octet_length(encode(COALESCE(text, '')))
       | ELSE 36 + 3 * (CASE WHEN abs(doc_id) % 3 = 0 THEN 1 ELSE 3 END)
       |      + octet_length(encode(COALESCE(text, ''))) END""".stripMargin

  /** Real container headers, real parsing: each document's text bytes
    * are wrapped in a genuine PNG or JFIF container (magic, IHDR/SOF0
    * big-endian dimensions, channel layout, CRC32s), then the metadata
    * is recovered by [[graft.functions.MediaCodecs.parseHeader]] —
    * actual chunk/marker walking, not arithmetic on the input. The
    * oracle predicts every field from the deterministic construction;
    * any parser offset/endianness error diverges. Batched typed
    * mapPartitions = the mapInPandas decode shape. */
  private val q50 = Q(
    "q50_multimodal_meta",
    s"""SELECT doc_id, $fmtSql AS format,
      |  CAST(abs(doc_id) % 640 + 1 AS INT) AS width,
      |  CAST(abs(doc_id) % 480 + 1 AS INT) AS height,
      |  CAST($chSql AS INT) AS channels,
      |  8 AS bit_depth,
      |  CAST($nBytesSql AS INT) AS n_bytes
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        coalesce(col("text"), lit("")).cast("binary").as("payload"))
      .as[MediaIn]
      .mapPartitions { it =>
        // one decoder per partition, records in batches of 64 — the
        // mapInPandas batch shape; encode real container, parse it back
        it.grouped(64).flatMap(_.map { m =>
          val bytes = buildContainer(m.doc_id, m.payload)
          val hdr = graft.functions.MediaCodecs.parseHeader(bytes)
          HeaderOut(m.doc_id, hdr.format, hdr.width, hdr.height,
            hdr.channels, hdr.bitDepth, bytes.length)
        })
      }.toDF()
      .orderBy("doc_id")
  }

  /** Aggregate media stats per format — decode once (real header
    * parse), aggregate metadata relationally: counts, byte totals, and
    * declared pixel volume (the capacity-planning numbers a media
    * pipeline reads off its catalog). */
  private val q51 = Q(
    "q51_multimodal_stats",
    s"""WITH meta AS (
      |  SELECT $fmtSql AS format, $chSql AS channels,
      |    CAST(abs(doc_id) % 640 + 1 AS BIGINT)
      |      * CAST(abs(doc_id) % 480 + 1 AS BIGINT) AS px,
      |    CAST($nBytesSql AS BIGINT) AS n_bytes
      |  FROM documents)
      |SELECT format, COUNT(*) AS n,
      |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
      |  CAST(MIN(n_bytes) AS INT) AS min_bytes,
      |  CAST(MAX(n_bytes) AS INT) AS max_bytes,
      |  CAST(SUM(px * channels) AS BIGINT) AS total_samples
      |FROM meta GROUP BY format ORDER BY format""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        coalesce(col("text"), lit("")).cast("binary").as("payload"))
      .as[MediaIn]
      .mapPartitions(_.grouped(64).flatMap(_.map { m =>
        val bytes = buildContainer(m.doc_id, m.payload)
        val hdr = graft.functions.MediaCodecs.parseHeader(bytes)
        HeaderOut(m.doc_id, hdr.format, hdr.width, hdr.height,
          hdr.channels, hdr.bitDepth, bytes.length)
      }))
      .groupBy("format")
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).cast("long").as("total_bytes"),
        min(col("n_bytes")).cast("int").as("min_bytes"),
        max(col("n_bytes")).cast("int").as("max_bytes"),
        sum(col("width").cast("long") * col("height") * col("channels"))
          .cast("long").as("total_samples"))
      .orderBy("format")
  }

  case class FrameStats(doc_id: Long, n_frames: Int, n_sampled: Int, sampled_checksum: Long)

  /** Frame extraction THROUGH the real audio codec (replaces the
    * round-≤9 byte-chunking stub): the payload bytes become 16-bit PCM
    * samples (sample_i = byte_i * 16 — Short-safe, non-negative so the
    * mod-997 checksum is portable), are encoded as a genuine RIFF/WAVE
    * file and decoded back by the actual chunk walker
    * ([[graft.functions.MediaCodecs.decodeWavPcm16]]), and the frames —
    * 32 DECODED samples each, every 4th frame kept — are computed from
    * what the codec returns, not from the input. Empty payloads skip
    * the codec (a zero-sample WAV is a placement question, not a codec
    * one) and report zero frames. The batch plumbing and bounded
    * expansion (n/4 frames per record, never the full payload exploded)
    * is the part that matters at 100 TB. */
  def sampleFrames(m: MediaIn): FrameStats = {
    if (m.payload.isEmpty) return FrameStats(m.doc_id, 0, 0, 0L)
    val samples = Array.tabulate(m.payload.length)(i =>
      ((m.payload(i) & 0xff) * 16).toShort)
    val wav = graft.functions.MediaCodecs.encodeWavPcm16(8000, samples)
    val (_, dec) = graft.functions.MediaCodecs.decodeWavPcm16(wav)
    val frameSize = 32
    val nFrames = (dec.length + frameSize - 1) / frameSize
    var sum = 0L
    var sampled = 0
    var f = 0
    while (f < nFrames) {
      if (f % 4 == 0) {
        sampled += 1
        var i = f * frameSize
        val end = math.min(i + frameSize, dec.length)
        while (i < end) { sum += dec(i); i += 1 }
      }
      f += 1
    }
    FrameStats(m.doc_id, nFrames, sampled, sum % 997)
  }

  /** Frame sampling over binary payloads through the WAV codec: every
    * 4th 32-sample frame, checksummed — the audio/video
    * keyframe-sampling pipeline shape with a real demuxer in the path. */
  private val q119 = Q(
    "q119_multimodal_frames",
    s"""${byteListCte()},
      |f AS (
      |  SELECT doc_id, len, bl,
      |    CAST((len + 31) // 32 AS INT) AS n_frames
      |  FROM bytes)
      |SELECT doc_id, n_frames,
      |  CAST(CASE WHEN len = 0 THEN 0 ELSE (n_frames + 3) // 4 END AS INT)
      |    AS n_sampled,
      |  CAST(COALESCE(list_sum(list_transform(
      |    flatten(list_transform(range(0, (n_frames + 3) // 4),
      |      s -> list_transform(range(s * 128 + 1,
      |             CAST(least(s * 128 + 32, len) AS BIGINT) + 1), i -> i))),
      |    i -> 16 * bl[CAST(i AS INT)])), 0) % 997
      |    AS BIGINT) AS sampled_checksum
      |FROM f ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaIn]
      .mapPartitions(_.grouped(64).flatMap(_.map(sampleFrames)))
      .toDF()
      .orderBy("doc_id")
  }

  case class BoxFit(
      doc_id: Long, w: Int, h: Int, out_w: Int, out_h: Int,
      sum_px: Long, ckw: Long)

  /** Thumbnail box-fit THROUGH the real image codec (replaces the
    * round-≤9 metadata-only stub): the payload bytes are rendered as a
    * gray/8 image whose dims derive from the byte length (w = len%32+1,
    * h = len%24+1 — capped so the all-docs oracle stays linear),
    * round-tripped through a genuine PNG encode→decode, then
    * ASPECT-PRESERVING-fitted into an 8×6 box with pure integer
    * cross-multiplication (never upscaled: w*6 ≤ h*8 means height
    * binds) and resampled by the real nearest-neighbor kernel
    * ([[graft.functions.MediaCodecs.resizeNearestGray]]). sum/ckw come
    * from the RESIZED pixels, so a wrong source-index mapping or any
    * codec byte error diverges. q396 is the fixed-box sibling; this one
    * owns the aspect arithmetic every thumbnail pipeline needs. */
  private val q120 = Q(
    "q120_multimodal_resize",
    s"""${byteListCte()},
      |dims AS (
      |  SELECT doc_id, len, bl,
      |    CAST(len % 32 + 1 AS INT) AS w, CAST(len % 24 + 1 AS INT) AS h
      |  FROM bytes),
      |px AS (
      |  SELECT doc_id, w, h,
      |    CASE WHEN w <= 8 AND h <= 6 THEN w
      |         WHEN w * 6 <= h * 8 THEN greatest(1, w * 6 // h)
      |         ELSE 8 END AS ow,
      |    CASE WHEN w <= 8 AND h <= 6 THEN h
      |         WHEN w * 6 <= h * 8 THEN 6
      |         ELSE greatest(1, h * 8 // w) END AS oh,
      |    list_transform(range(0, CAST(w AS BIGINT) * h),
      |      i -> CASE WHEN i < len THEN bl[CAST(i + 1 AS INT)] ELSE 0 END)
      |      AS pl
      |  FROM dims),
      |rs AS (
      |  SELECT doc_id, w, h, ow, oh,
      |    list_transform(range(0, CAST(ow AS BIGINT) * oh), k ->
      |      pl[CAST(((k // ow) * h // oh) * w + ((k % ow) * w // ow) + 1
      |              AS INT)]) AS rl
      |  FROM px)
      |SELECT doc_id, w, h, CAST(ow AS INT) AS out_w, CAST(oh AS INT) AS out_h,
      |  CAST(COALESCE(list_sum(rl), 0) AS BIGINT) AS sum_px,
      |  CAST(COALESCE(list_sum(list_transform(
      |    range(1, CAST(ow AS BIGINT) * oh + 1),
      |    k -> rl[CAST(k AS INT)] * k)), 0) % 1000003 AS BIGINT) AS ckw
      |FROM rs ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaIn]
      .mapPartitions(_.grouped(64).flatMap(_.map { m =>
        val len = m.payload.length
        val w = len % 32 + 1; val h = len % 24 + 1
        val png = graft.functions.MediaCodecs.encodePngGray(
          w, h, bytePixels(m.payload, w * h))
        val (dw, dh, dec) = graft.functions.MediaCodecs.decodePngGray(png)
        val (ow, oh) =
          if (dw <= 8 && dh <= 6) (dw, dh)
          else if (dw * 6 <= dh * 8) (math.max(1, dw * 6 / dh), 6)
          else (8, math.max(1, dh * 8 / dw))
        val rs = graft.functions.MediaCodecs.resizeNearestGray(dec, dw, dh, ow, oh)
        var sum = 0L; var ckw = 0L
        var k = 0
        while (k < rs.length) {
          val v = rs(k) & 0xff
          sum += v
          ckw = (ckw + v.toLong * (k + 1)) % 1000003
          k += 1
        }
        BoxFit(m.doc_id, dw, dh, ow, oh, sum, ckw)
      }))
      .toDF()
      .orderBy("doc_id")
  }

  /** Deterministic pseudo-random centroid component (the q139 LCG). */
  private def coef(idx: Int): Double = {
    val x = (1103515245L * idx + 12345L) % 2147483648L
    x.toDouble / 2147483648.0 * 2.0 - 1.0
  }

  private val FeatDim = 8
  private val FeatCells = 4
  private val featCents: Array[Array[Double]] =
    Array.tabulate(FeatCells, FeatDim)((c, j) => coef(2048 + c * FeatDim + j))

  /** Feature extraction THROUGH the real image codec (replaces the
    * round-≤9 byte-stride stub): the payload's first 768 bytes are
    * rendered as a 32×24 gray image, round-tripped through a genuine
    * PNG encode→decode, and the features are 8 pixel-stride sums over
    * the DECODED scanlines scaled by 1/255 — integer sums then one
    * division keep it bit-identical cross-engine, and any filter/
    * offset error in the codec shifts a stride sum. Stands in for an
    * image embedding model with the same batch shape. */
  def pixelFeatures(m: MediaIn): (Long, Array[Double]) = {
    val png = graft.functions.MediaCodecs.encodePngGray(
      32, 24, bytePixels(m.payload, 768))
    val (_, _, dec) = graft.functions.MediaCodecs.decodePngGray(png)
    val s = new Array[Long](FeatDim)
    var i = 0
    while (i < dec.length) {
      s(i % FeatDim) += (dec(i) & 0xff); i += 1
    }
    (m.doc_id, s.map(_.toDouble / 255.0))
  }

  private def duckDist(c: Int): String = {
    val lits = featCents(c).mkString(", ")
    s"""list_sum(list_transform(range(1, ${FeatDim + 1}),
       |  j -> (fv[j] - CAST(([$lits])[j] AS DOUBLE)) *
       |       (fv[j] - CAST(([$lits])[j] AS DOUBLE))))""".stripMargin
  }

  /** Multimodal → vector-index integration: batch feature extraction
    * (REAL PNG round trip in the path — [[pixelFeatures]]) straight
    * into the IVF cell assignment ([[graft.functions.NearestCell]],
    * codegen) — the ingest shape that turns a media corpus into an
    * ANN-indexable table in one pass, no shuffle. The oracle replays
    * bytes → 768-capped stride sums → argmin (zero padding adds
    * nothing to a sum, so it replays the padded image exactly; ties to
    * the lowest cell index, NearestCell's contract). */
  private val q154 = Q(
    "q154_multimodal_features",
    s"""${byteListCte()},
      |f AS (
      |  SELECT doc_id,
      |    list_transform(range(0, $FeatDim), j ->
      |      CAST(COALESCE(list_sum(list_transform(range(1, least(len, 768) + 1),
      |        i -> CASE WHEN (i - 1) % $FeatDim = j THEN bl[i] ELSE 0 END)), 0)
      |        AS DOUBLE) / 255.0) AS fv
      |  FROM bytes),
      |d AS (
      |  SELECT doc_id, fv,
      |    ${(0 until FeatCells).map(c => s"(${duckDist(c)}) AS d$c").mkString(",\n    ")}
      |  FROM f)
      |SELECT doc_id,
      |  ${(1 to FeatDim).map(j => s"fv[$j] AS f${j - 1}").mkString(", ")},
      |  CAST(CASE WHEN d0 <= d1 AND d0 <= d2 AND d0 <= d3 THEN 0
      |            WHEN d1 <= d2 AND d1 <= d3 THEN 1
      |            WHEN d2 <= d3 THEN 2 ELSE 3 END AS INT) AS cell
      |FROM d ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.graftbridge.Bridge
    val media = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaIn]
    val feats = media.mapPartitions { it =>
      it.grouped(64).flatMap(batch => batch.map(pixelFeatures))
    }.toDF("doc_id", "fv")
    feats
      .withColumn("cell", Bridge.column(
        graft.functions.NearestCell(Bridge.expr(col("fv")), featCents)))
      .select(
        (col("doc_id") +:
          (0 until FeatDim).map(j => element_at(col("fv"), j + 1).as(s"f$j"))) :+
          col("cell"): _*)
      .orderBy("doc_id")
  }

  // ------------- q258: perceptual-hash near-dup over binary payloads

  case class MediaHash(doc_id: Long, h_hi: Long, h_lo: Long)

  /** Hamming bands for LSH over the 64-bit aHash: 4 x 16-bit chunks,
    * threshold 3. Two constraints fight here: recall needs MORE bands
    * than the threshold (<= 3 differing bits dirty at most 3 of 4
    * bands — pigeonhole leaves a clean band, recall exactly 1), while
    * candidate volume needs WIDE bands (collision rate per band is
    * 2^-width; 16 bits -> n^2/2^16 expected random-collision pairs
    * per band vs n^2/2^9 for the 7x9-ish split that a threshold of 6
    * would force). 4 x 16 @ t=3 is the lossless point with the widest
    * bands — same reasoning as q46's 15/16-bit SimHash bands. */
  private val HamBands = 4
  private val HamThreshold = 3

  /** Near-duplicate detection over opaque media payloads THROUGH the
    * real codec: batched aHash ([[aHash32x24]] — genuine PNG
    * encode→decode in the path), then SimHash-style hamming LSH —
    * pairs sharing any 16-bit band verified exactly with
    * bit_count(xor) <= 3, which the band count makes lossless (see
    * [[HamBands]]), so the all-pairs oracle must match bit-for-bit.
    * The hash pass is one mapPartitions over the payload scan;
    * candidates come from band equi-joins (never an all-pairs
    * surface); the q45 degenerate-bucket cap applies unchanged. */
  private val q258 = Q(
    "q258_phash_neardup",
    s"""${byteListCte()},
       |px AS (
       |  SELECT doc_id,
       |    list_transform(range(0, 768),
       |      i -> CASE WHEN len = 0 THEN 0
       |                ELSE bl[CAST(i % len + 1 AS INT)] END) AS pl
       |  FROM bytes),
       |tot AS (SELECT doc_id, pl, list_sum(pl) AS total FROM px),
       |bits AS (
       |  SELECT doc_id,
       |    list_transform(range(0, 64), b -> CASE WHEN
       |      64 * list_sum(list_transform(range(0, 12), j ->
       |        pl[CAST(((b // 8) * 3 + j // 4) * 32
       |               + (b % 8) * 4 + j % 4 + 1 AS INT)]))
       |      > total THEN 1 ELSE 0 END) AS bv
       |  FROM tot),
       |ha AS (
       |  SELECT doc_id,
       |    list_sum(list_transform(range(0, 32),
       |      b -> bv[CAST(b + 33 AS INT)] * (1::BIGINT << CAST(b AS INT)))) AS h_hi,
       |    list_sum(list_transform(range(0, 32),
       |      b -> bv[CAST(b + 1 AS INT)] * (1::BIGINT << CAST(b AS INT)))) AS h_lo
       |  FROM bits)
       |SELECT a.doc_id AS d1, b.doc_id AS d2,
       |  CAST(bit_count(xor(a.h_hi, b.h_hi))
       |     + bit_count(xor(a.h_lo, b.h_lo)) AS INT) AS hamming
       |FROM ha a JOIN ha b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.h_hi, b.h_hi))
       |    + bit_count(xor(a.h_lo, b.h_lo)) <= $HamThreshold
       |ORDER BY d1, d2""".stripMargin) { (s, dir) =>
    import s.implicits._
    val hashes = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaIn]
      .mapPartitions(_.grouped(64).flatMap(_.map { m =>
        val (hHi, hLo) = aHash32x24(tiledPixels(m.payload, 768))
        MediaHash(m.doc_id, hHi, hLo)
      }))
      .toDF().localCheckpoint()
    val bands = hashes.select(col("doc_id"), col("h_hi"), col("h_lo"),
      explode(expr(s"transform(sequence(0, ${HamBands - 1}), " +
        "j -> struct(j AS band, CASE WHEN j < 2 " +
        "THEN shiftright(h_lo, 16 * j) & 65535 " +
        "ELSE shiftright(h_hi, 16 * (j - 2)) & 65535 END AS key))")).as("bk"))
      .select(col("doc_id"), col("h_hi"), col("h_lo"),
        col("bk.band"), col("bk.key"))
    // Degenerate-bucket guard: a band bucket above the cap would make
    // the candidate self-join quadratic IN THAT BUCKET. Pairs whose
    // every band is over-capped would be LOST, silently diverging from
    // the all-pairs oracle — so over-capped buckets fail loudly (with
    // the count) instead of being dropped; the remedy is more/wider
    // bands or pre-clustering the degenerate payload class, both
    // visible decisions rather than silent recall loss.
    val maxBucket = 10000
    val bucketSizes = bands.groupBy("band", "key")
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn") > 1)
      .localCheckpoint()
    val overCap = bucketSizes.filter(col("bn") > maxBucket).count()
    if (overCap > 0) throw new IllegalStateException(
      s"q258: $overCap LSH band bucket(s) exceed $maxBucket members — " +
        "refusing to silently drop their pairs; widen the band key space " +
        "or pre-cluster the degenerate payloads")
    val okBuckets = bucketSizes.select("band", "key")
    val inBucket = bands.join(okBuckets, Seq("band", "key"))
    val cand = inBucket.as("a")
      .join(inBucket.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"),
        col("a.h_hi").as("h1_hi"), col("a.h_lo").as("h1_lo"),
        col("b.doc_id").as("d2"),
        col("b.h_hi").as("h2_hi"), col("b.h_lo").as("h2_lo"))
      .distinct()
    cand
      .withColumn("hamming",
        (bit_count(expr("h1_hi ^ h2_hi")) + bit_count(expr("h1_lo ^ h2_lo")))
          .cast("int"))
      .filter(col("hamming") <= HamThreshold)
      .select("d1", "d2", "hamming")
      .orderBy("d1", "d2")
  }

  case class PngRt(
      doc_id: Long, w: Int, h: Int, n_px: Int,
      sum_px: Long, min_px: Int, max_px: Int, ckw: Long)

  /** q387: REAL PNG pixel codec round trip. Per document a synthetic
    * 8-bit grayscale image (dims and pixels deterministic in doc_id) is
    * encoded as a genuine, viewer-openable PNG — zlib-deflated IDAT,
    * per-row filters cycling None/Sub/Up — then decoded back by
    * [[graft.functions.MediaCodecs.decodePngGray]] (chunk walk, inflate,
    * defilter), and the stats are computed from the DECODED pixels. The
    * oracle computes the same stats from the generation formula, so a
    * single wrong byte anywhere in the codec path (filter math,
    * scanline offsets, inflate plumbing) diverges. The order-weighted
    * checksum pins pixel POSITIONS, not just the multiset. Dims are
    * capped at 32x24 so the all-docs oracle stays linear. */
  private val q387 = Q(
    "q387_png_pixel_roundtrip",
    """WITH dims AS (
      |  SELECT doc_id, abs(doc_id) % 1000003 AS d,
      |    CAST(abs(doc_id) % 32 + 1 AS INT) AS w,
      |    CAST(abs(doc_id) % 24 + 1 AS INT) AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, w, h,
      |    list_transform(range(0, CAST(w AS BIGINT) * h),
      |      i -> (d * 31 + i * 7) % 256) AS pl
      |  FROM dims)
      |SELECT doc_id, w, h, CAST(w * h AS INT) AS n_px,
      |  CAST(list_sum(pl) AS BIGINT) AS sum_px,
      |  CAST(list_min(pl) AS INT) AS min_px,
      |  CAST(list_max(pl) AS INT) AS max_px,
      |  CAST(list_sum(list_transform(range(1, CAST(w AS BIGINT) * h + 1),
      |    i -> pl[CAST(i AS INT)] * i)) % 1000003 AS BIGINT) AS ckw
      |FROM px ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.grouped(64).flatMap(_.map { id =>
        val d = math.abs(id) % 1000003
        val w = (math.abs(id) % 32 + 1).toInt
        val h = (math.abs(id) % 24 + 1).toInt
        val pixels = Array.tabulate(w * h)(i =>
          ((d * 31 + i.toLong * 7) % 256).toByte)
        val png = graft.functions.MediaCodecs.encodePngGray(w, h, pixels)
        val (dw, dh, dec) = graft.functions.MediaCodecs.decodePngGray(png)
        var sum = 0L; var mn = 255; var mx = 0; var ckw = 0L
        var i = 0
        while (i < dec.length) {
          val v = dec(i) & 0xff
          sum += v; if (v < mn) mn = v; if (v > mx) mx = v
          ckw = (ckw + v.toLong * (i + 1)) % 1000003
          i += 1
        }
        PngRt(id, dw, dh, dw * dh, sum, mn, mx, ckw)
      }))
      .toDF()
      .orderBy("doc_id")
  }

  case class AHash(doc_id: Long, h_hi: Long, h_lo: Long)

  /** 64-bit average-hash THROUGH the real codec: the 32×24 gray pixels
    * are encoded as a genuine PNG and decoded back (zlib, filters,
    * chunk walk), then downsampled to 8×8 by exact integer 4×3-block
    * sums; bit b is set iff 64·blockSum > totalSum (cross-multiplied —
    * no division, no floats). Returned as (hi, lo) 32-bit halves so
    * every engine-side comparison stays in portable BIGINT range.
    * Shared by q394 (grouped exact dedup) and q258 (banded hamming
    * near-dup). */
  private[graft] def aHash32x24(pixels: Array[Byte]): (Long, Long) = {
    val png = graft.functions.MediaCodecs.encodePngGray(32, 24, pixels)
    val (_, _, dec) = graft.functions.MediaCodecs.decodePngGray(png)
    var total = 0L
    var i = 0
    while (i < dec.length) { total += (dec(i) & 0xff); i += 1 }
    var hLo = 0L; var hHi = 0L
    var b = 0
    while (b < 64) {
      val bx = b % 8; val by = b / 8
      var blockSum = 0L
      var j = 0
      while (j < 12) {
        val x = bx * 4 + j % 4; val y = by * 3 + j / 4
        blockSum += (dec(y * 32 + x) & 0xff)
        j += 1
      }
      if (64L * blockSum > total) {
        if (b < 32) hLo |= 1L << b else hHi |= 1L << (b - 32)
      }
      b += 1
    }
    (hHi, hLo)
  }

  /** q394: perceptual average-hash (aHash) image dedup THROUGH the real
    * codec: per document a 32x24 gray image (pixels seeded by
    * abs(doc_id)%97, so ~n/97 documents share an identical image —
    * planted dup groups) is encoded as a genuine PNG, decoded back
    * (inflate + defilter), downsampled 8x8 by exact integer block sums,
    * and each bit compares its block mean to the global mean with the
    * cross-multiplied integer test (64*blockSum > totalSum — no
    * division, no floats). Groups come from ONE shuffle on the 64-bit
    * hash (split hi/lo to stay in portable BIGINT range) — exactly how
    * image dedup runs at 100 TB: linear scan + hash groupBy, no pair
    * joins. The oracle computes the same bits from the pixel FORMULA,
    * so the Spark side's hash is only right if the whole
    * encode→decode→downsample path is. */
  private val q394 = Q(
    "q394_ahash_image_dedup",
    """WITH d AS (SELECT doc_id, abs(doc_id) % 97 AS seed FROM documents),
      |px AS (
      |  SELECT doc_id,
      |    list_transform(range(0, 768), i -> (seed * 31 + i * 7) % 256) AS pl
      |  FROM d),
      |tot AS (SELECT doc_id, pl, list_sum(pl) AS total FROM px),
      |bits AS (
      |  SELECT doc_id,
      |    list_transform(range(0, 64), b -> CASE WHEN
      |      64 * list_sum(list_transform(range(0, 12), j ->
      |        pl[CAST(((b // 8) * 3 + j // 4) * 32
      |               + (b % 8) * 4 + j % 4 + 1 AS INT)]))
      |      > total THEN 1 ELSE 0 END) AS bv
      |  FROM tot),
      |h AS (
      |  SELECT doc_id,
      |    list_sum(list_transform(range(0, 32),
      |      b -> bv[CAST(b + 33 AS INT)] * (1::BIGINT << CAST(b AS INT)))) AS h_hi,
      |    list_sum(list_transform(range(0, 32),
      |      b -> bv[CAST(b + 1 AS INT)] * (1::BIGINT << CAST(b AS INT)))) AS h_lo
      |  FROM bits)
      |SELECT CAST(h_hi AS BIGINT) AS h_hi, CAST(h_lo AS BIGINT) AS h_lo,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(min(doc_id) AS BIGINT) AS first_doc,
      |  CAST(sum(doc_id) AS BIGINT) AS sum_docs
      |FROM h GROUP BY h_hi, h_lo HAVING count(*) > 1
      |ORDER BY h_hi, h_lo, first_doc""".stripMargin) { (s, dir) =>
    import s.implicits._
    val W = 32; val H = 24
    val hashes = Tables.load(s, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.grouped(64).flatMap(_.map { id =>
        val seed = math.abs(id) % 97
        val pixels = Array.tabulate(W * H)(i =>
          ((seed * 31 + i.toLong * 7) % 256).toByte)
        val (hHi, hLo) = aHash32x24(pixels)
        AHash(id, hHi, hLo)
      }))
    hashes.toDF()
      .groupBy("h_hi", "h_lo")
      .agg(count(lit(1)).as("n_docs"),
        min("doc_id").as("first_doc"), sum("doc_id").as("sum_docs"))
      .filter(col("n_docs") > 1)
      .orderBy("h_hi", "h_lo", "first_doc")
  }

  case class WavStats(
      doc_id: Long, sample_rate: Int, bits: Int, n_samples: Int,
      sum_s: Long, min_s: Int, max_s: Int, abs_energy: Long, zero_cross: Long)

  /** q395: REAL audio codec round trip — per document a seeded 16-bit
    * PCM signal is encoded as a genuine RIFF/WAVE file (canonical
    * 44-byte header, little-endian everywhere) and decoded back by
    * actually walking the RIFF chunks; the stats — including zero
    * crossings, the classic cheap audio feature — are computed from the
    * DECODED samples. The oracle replays the signal formula, so any
    * endianness/offset/alignment error in the codec diverges. The WAV
    * twin of q387's PNG round trip: the audio modality stops being
    * stub-backed. */
  private val q395 = Q(
    "q395_wav_audio_stats",
    """WITH d AS (
      |  SELECT doc_id, abs(doc_id) % 1000003 AS sd,
      |    CAST(abs(doc_id) % 800 + 100 AS INT) AS n
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, n,
      |    list_transform(range(0, n), i -> (sd * 31 + i * 7) % 2048 - 1024)
      |      AS sl
      |  FROM d)
      |SELECT doc_id, 8000 AS sample_rate, 16 AS bits, n AS n_samples,
      |  CAST(list_sum(sl) AS BIGINT) AS sum_s,
      |  CAST(list_min(sl) AS INT) AS min_s,
      |  CAST(list_max(sl) AS INT) AS max_s,
      |  CAST(list_sum(list_transform(sl, x -> abs(x))) AS BIGINT)
      |    AS abs_energy,
      |  CAST(COALESCE(list_sum(list_transform(range(1, n), i ->
      |    CASE WHEN (sl[CAST(i AS INT)] < 0) <> (sl[CAST(i + 1 AS INT)] < 0)
      |         THEN 1 ELSE 0 END)), 0) AS BIGINT) AS zero_cross
      |FROM s ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.grouped(64).flatMap(_.map { id =>
        val sd = math.abs(id) % 1000003
        val n = (math.abs(id) % 800 + 100).toInt
        val samples = Array.tabulate(n)(i =>
          ((sd * 31 + i.toLong * 7) % 2048 - 1024).toShort)
        val wav = graft.functions.MediaCodecs.encodeWavPcm16(8000, samples)
        val (hdr, dec) = graft.functions.MediaCodecs.decodeWavPcm16(wav)
        var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
        var energy = 0L; var zc = 0L
        var i = 0
        while (i < dec.length) {
          val v = dec(i).toInt
          sum += v; if (v < mn) mn = v; if (v > mx) mx = v
          energy += math.abs(v)
          if (i > 0 && ((dec(i - 1) < 0) != (v < 0))) zc += 1
          i += 1
        }
        WavStats(id, hdr.sampleRate, hdr.bitsPerSample, hdr.nSamples,
          sum, mn, mx, energy, zc)
      }))
      .toDF()
      .orderBy("doc_id")
  }

  case class ResizeOut(doc_id: Long, out_w: Int, out_h: Int, sum_px: Long, ckw: Long)

  /** q396: REAL pixel resize — decode the q387-style PNG through the
    * actual codec, then nearest-neighbor downscale with exact integer
    * source mapping (srcX = dstX*srcW/dstW floor). Replaces q120's
    * metadata-only resize with real pixel work; the oracle replays the
    * identical index arithmetic on the generation formula, so the
    * output is right only if decode AND resampling both are. */
  private val q396 = Q(
    "q396_image_resize_real",
    """WITH dims AS (
      |  SELECT doc_id, abs(doc_id) % 1000003 AS d,
      |    CAST(abs(doc_id) % 32 + 1 AS INT) AS w,
      |    CAST(abs(doc_id) % 24 + 1 AS INT) AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, w, h, least(w, 8) AS ow, least(h, 6) AS oh,
      |    list_transform(range(0, CAST(w AS BIGINT) * h),
      |      i -> (d * 31 + i * 7) % 256) AS pl
      |  FROM dims),
      |rs AS (
      |  SELECT doc_id, ow, oh,
      |    list_transform(range(0, CAST(ow AS BIGINT) * oh), k ->
      |      pl[CAST(((k // ow) * h // oh) * w + ((k % ow) * w // ow) + 1
      |              AS INT)]) AS rl
      |  FROM px)
      |SELECT doc_id, CAST(ow AS INT) AS out_w, CAST(oh AS INT) AS out_h,
      |  CAST(list_sum(rl) AS BIGINT) AS sum_px,
      |  CAST(list_sum(list_transform(range(1, CAST(ow AS BIGINT) * oh + 1),
      |    k -> rl[CAST(k AS INT)] * k)) % 1000003 AS BIGINT) AS ckw
      |FROM rs ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.grouped(64).flatMap(_.map { id =>
        val d = math.abs(id) % 1000003
        val w = (math.abs(id) % 32 + 1).toInt
        val h = (math.abs(id) % 24 + 1).toInt
        val pixels = Array.tabulate(w * h)(i =>
          ((d * 31 + i.toLong * 7) % 256).toByte)
        val png = graft.functions.MediaCodecs.encodePngGray(w, h, pixels)
        val (dw, dh, dec) = graft.functions.MediaCodecs.decodePngGray(png)
        val ow = math.min(dw, 8); val oh = math.min(dh, 6)
        val rs = graft.functions.MediaCodecs.resizeNearestGray(dec, dw, dh, ow, oh)
        var sum = 0L; var ckw = 0L
        var k = 0
        while (k < rs.length) {
          val v = rs(k) & 0xff
          sum += v
          ckw = (ckw + v.toLong * (k + 1)) % 1000003
          k += 1
        }
        ResizeOut(id, ow, oh, sum, ckw)
      }))
      .toDF()
      .orderBy("doc_id")
  }

  case class JpegRt(doc_id: Long, w: Int, h: Int, n_px: Int,
      quarantined: Int, sum_px: Long, min_px: Int, max_px: Int)

  /** q429: REAL JPEG pixel codec round trip — the baseline-sequential
    * encoder+decoder in [[graft.functions.MediaCodecs]] (standard
    * Annex-K quantization + Huffman tables, FDCT/IDCT, byte stuffing,
    * restart handling), closing the last container-only modality (q51
    * parsed JFIF markers; this decodes PIXELS, ImageIO-cross-checked
    * both directions by JpegCodecSpec). Per document a 32x24 image of
    * FLAT 8x8 blocks with even offsets from 128 — the one image family
    * a quality-50 JPEG reproduces EXACTLY (a flat block quantizes to a
    * lone even DC coefficient; DC step 16 halves it without rounding),
    * so the oracle replays the decoded stats from the generation
    * formula and any codec byte error diverges the hash. Every 10th
    * document's stream is truncated mid-tables: the decoder must
    * QUARANTINE it (fail loudly, caught per row), never emit garbage
    * pixels. Per-row codegen-adjacent work, no shuffle — the q387
    * scale shape. */
  private val q429 = Q(
    "q429_jpeg_pixel_roundtrip",
    """WITH d AS (
      |  SELECT doc_id, abs(doc_id) % 1000003 AS dd FROM documents),
      |bl AS (
      |  SELECT doc_id,
      |    list_transform(range(0, 12),
      |      b -> 128 + 2 * (((dd * 31 + b * 7) % 51) - 25)) AS bv
      |  FROM d)
      |SELECT doc_id,
      |  CAST(CASE WHEN doc_id % 10 = 0 THEN 0 ELSE 32 END AS INT) AS w,
      |  CAST(CASE WHEN doc_id % 10 = 0 THEN 0 ELSE 24 END AS INT) AS h,
      |  CAST(CASE WHEN doc_id % 10 = 0 THEN 0 ELSE 768 END AS INT) AS n_px,
      |  CAST(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END AS INT)
      |    AS quarantined,
      |  CAST(CASE WHEN doc_id % 10 = 0 THEN 0
      |       ELSE 64 * list_sum(bv) END AS BIGINT) AS sum_px,
      |  CAST(CASE WHEN doc_id % 10 = 0 THEN 0
      |       ELSE list_min(bv) END AS INT) AS min_px,
      |  CAST(CASE WHEN doc_id % 10 = 0 THEN 0
      |       ELSE list_max(bv) END AS INT) AS max_px
      |FROM bl ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val dd = math.abs(id) % 1000003
        val w = 32; val h = 24
        val px = Array.tabulate(w * h) { i =>
          val b = ((i / w) / 8) * 4 + (i % w) / 8
          (128 + 2 * (((dd * 31 + b * 7) % 51) - 25)).toByte
        }
        val jpg = graft.functions.MediaCodecs.encodeJpegGray(w, h, px)
        val bytes = if (id % 10 == 0) jpg.take(jpg.length / 2) else jpg
        try {
          val (dw, dh, dec) = graft.functions.MediaCodecs.decodeJpegGray(bytes)
          var sum = 0L; var mn = 255; var mx = 0
          var i = 0
          while (i < dec.length) {
            val v = dec(i) & 0xff
            sum += v; if (v < mn) mn = v; if (v > mx) mx = v
            i += 1
          }
          JpegRt(id, dw, dh, dec.length, 0, sum, mn, mx)
        } catch {
          case _: Exception => JpegRt(id, 0, 0, 0, 1, 0L, 0, 0)
        }
      })
      .toDF()
      .orderBy("doc_id")
  }

  // ------------- q436: COLOR JPEG (YCbCr 4:2:0) pixel round trip

  /** q436: the color leg of the q429 contract — baseline YCbCr 4:2:0
    * JPEG ([[graft.functions.MediaCodecs.encodeJpegColor]] /
    * `decodeJpegColor`): interleaved 16x16 MCUs (4 Y + Cb + Cr blocks),
    * Annex-K chroma tables, integer YCbCr↔RGB. The fixture is
    * GRAY-VALUED color (R=G=B, flat even-offset 8x8 blocks): chroma is
    * exactly 128 and the luma DC is a multiple of its quant step, so
    * the full 3-component pipeline — subsampling, chroma Huffman,
    * upsampling, color transform — must reproduce every RGB byte
    * EXACTLY, which makes the oracle hash-checkable despite JPEG being
    * lossy in general (perceptual color accuracy vs ImageIO is pinned
    * in JpegColorSpec). Truncated streams quarantine loudly. */
  private val q436 = Q(
    "q436_jpeg_color_roundtrip",
    """WITH d AS (
      |  SELECT doc_id, abs(doc_id) % 1000003 AS dd FROM documents),
      |bl AS (
      |  SELECT doc_id,
      |    list_transform(range(0, 12),
      |      b -> 128 + 2 * (((dd * 37 + b * 11) % 51) - 25)) AS bv
      |  FROM d)
      |SELECT doc_id,
      |  CAST(CASE WHEN doc_id % 9 = 0 THEN 0 ELSE 32 END AS INT) AS w,
      |  CAST(CASE WHEN doc_id % 9 = 0 THEN 0 ELSE 24 END AS INT) AS h,
      |  CAST(CASE WHEN doc_id % 9 = 0 THEN 0 ELSE 2304 END AS INT) AS n_px,
      |  CAST(CASE WHEN doc_id % 9 = 0 THEN 1 ELSE 0 END AS INT)
      |    AS quarantined,
      |  CAST(CASE WHEN doc_id % 9 = 0 THEN 0
      |       ELSE 3 * 64 * list_sum(bv) END AS BIGINT) AS sum_px,
      |  CAST(CASE WHEN doc_id % 9 = 0 THEN 0
      |       ELSE list_min(bv) END AS INT) AS min_px,
      |  CAST(CASE WHEN doc_id % 9 = 0 THEN 0
      |       ELSE list_max(bv) END AS INT) AS max_px
      |FROM bl ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val dd = math.abs(id) % 1000003
        val w = 32; val h = 24
        val rgb = new Array[Byte](3 * w * h)
        var i = 0
        while (i < w * h) {
          val b = ((i / w) / 8) * 4 + (i % w) / 8
          val v = (128 + 2 * (((dd * 37 + b * 11) % 51) - 25)).toByte
          rgb(3 * i) = v; rgb(3 * i + 1) = v; rgb(3 * i + 2) = v
          i += 1
        }
        val jpg = graft.functions.MediaCodecs.encodeJpegColor(w, h, rgb)
        val bytes = if (id % 9 == 0) jpg.take(jpg.length / 2) else jpg
        try {
          val (dw, dh, dec) =
            graft.functions.MediaCodecs.decodeJpegColor(bytes)
          var sum = 0L; var mn = 255; var mx = 0
          var j = 0
          while (j < dec.length) {
            val v = dec(j) & 0xff
            sum += v; if (v < mn) mn = v; if (v > mx) mx = v
            j += 1
          }
          JpegRt(id, dw, dh, dec.length, 0, sum, mn, mx)
        } catch {
          case _: Exception => JpegRt(id, 0, 0, 0, 1, 0L, 0, 0)
        }
      })
      .toDF()
      .orderBy("doc_id")
  }

  val defs: Seq[Q] =
    Seq(q50, q51, q119, q120, q154, q258, q387, q394, q395, q396, q429, q436)
}
