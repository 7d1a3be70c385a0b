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
  case class MediaMeta(
      doc_id: Long, n_bytes: Int, checksum: Long,
      fake_width: Int, fake_height: Int, format: String)

  /** STUB decoder: stands in for an image/audio codec. Deterministic on
    * payload bytes; replace with a real codec binding at deployment. */
  def decodeStub(m: MediaIn): MediaMeta = {
    var sum = 0L
    var i = 0
    while (i < m.payload.length) { sum += (m.payload(i) & 0xff); i += 1 }
    val checksum = sum % 997
    val fmt = (m.payload.headOption.map(_ & 0xff).getOrElse(0)) % 3 match {
      case 0 => "png"
      case 1 => "jpeg"
      case _ => "webp"
    }
    MediaMeta(m.doc_id, m.payload.length, checksum,
      m.payload.length % 640 + 1, (checksum % 480).toInt + 1, fmt)
  }

  private val q50 = Q(
    "q50_multimodal_meta",
    """WITH meta AS (
      |  SELECT doc_id, CAST(length(text) AS INT) AS n_bytes,
      |    CAST(list_sum(list_transform(range(1, length(text) + 1),
      |             i -> CAST(ord(substring(text, i, 1)) AS BIGINT))) % 997 AS BIGINT) AS checksum,
      |    ord(substring(text, 1, 1)) % 3 AS fb
      |  FROM documents)
      |SELECT doc_id, n_bytes, checksum,
      |  CAST(n_bytes % 640 + 1 AS INT) AS fake_width,
      |  CAST(checksum % 480 AS INT) + 1 AS fake_height,
      |  CASE fb WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format
      |FROM meta ORDER BY doc_id""".stripMargin) { (s, dir) =>
    // documents.text stands in for the media payload (ASCII, so the byte
    // checksum equals DuckDB's codepoint sum). Batched typed pipeline:
    // binary column in, metadata record out.
    import s.implicits._
    val media = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaIn]
    media.mapPartitions { it =>
      // one "decoder" per partition, records in batches of 64 — the
      // mapInPandas batch shape; the stub is where a codec would live.
      it.grouped(64).flatMap(batch => batch.map(decodeStub))
    }.toDF()
      .select(col("doc_id"), col("n_bytes"), col("checksum"),
        col("fake_width"), col("fake_height"), col("format"))
      .orderBy("doc_id")
  }

  /** Aggregate media stats per (format) — the downstream-pipeline shape:
    * decode once, aggregate metadata columns relationally. */
  private val q51 = Q(
    "q51_multimodal_stats",
    """WITH meta AS (
      |  SELECT CASE ord(substring(text, 1, 1)) % 3
      |           WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format,
      |         length(text) AS n_bytes
      |  FROM documents)
      |SELECT format, COUNT(*) AS n, CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
      |  CAST(MIN(n_bytes) AS INT) AS min_bytes, CAST(MAX(n_bytes) AS INT) AS max_bytes
      |FROM meta GROUP BY format ORDER BY format""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaIn]
      .mapPartitions(_.grouped(64).flatMap(_.map(decodeStub)))
      .groupBy("format")
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).cast("long").as("total_bytes"),
        min(col("n_bytes")).cast("int").as("min_bytes"),
        max(col("n_bytes")).cast("int").as("max_bytes"))
      .orderBy("format")
  }

  val defs: Seq[Q] = Seq(q50, q51)
}
