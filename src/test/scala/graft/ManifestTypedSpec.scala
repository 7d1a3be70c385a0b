package graft

import org.scalatest.funsuite.AnyFunSuite

/** TIMESTAMP / DECIMAL / BOOLEAN columns through the manifest
  * connector (q439's mechanism). The canonical row rendering is
  * format-independent — micros digits, plain-scale decimal, true/false
  * — so checksums, delete vectors, and format-converting compactions
  * stay exact across CSV and parquet. Pins:
  *  - value round trip through BOTH formats;
  *  - timestamp zone maps prune files AND row groups;
  *  - pushed equality on decimal/boolean evaluates correctly;
  *  - csv→parquet compaction of a typed table passes the checksum
  *    conservation guard (same canonical rendering both sides).
  */
class ManifestTypedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_typ").toString
    new java.io.File(d).delete()
    d
  }

  private val Ddl = "ts TIMESTAMP, amt DECIMAL(14,2), flag BOOLEAN, k BIGINT"

  /** k rows with ts = epoch + i hours, amt = i + i/100, flag = even. */
  private def fixture(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      (java.sql.Timestamp.from(
        java.time.Instant.parse("2024-03-01T00:00:00Z")
          .plusSeconds(3600L * i)),
        new java.math.BigDecimal(s"$i.${"%02d".format(i % 100)}"),
        i % 2 == 0, i.toLong)
    }.toDF("ts", "amt", "flag", "k")
      .select(col("ts"), col("amt").cast("decimal(14,2)"),
        col("flag"), col("k"))
  }

  private def scan(out: String) = spark.read
    .format("graft.sources.ManifestSource")
    .schema(Ddl).option("path", out).load()

  test("typed values round-trip identically through csv and parquet") {
    val csv = freshDir(); val pq = freshDir()
    val src = fixture(50)
    src.coalesce(1).write.format("graft.sources.ManifestSink")
      .option("path", csv).mode("append").save()
    src.coalesce(1).write.format("graft.sources.ManifestSink")
      .option("path", pq).option("format", "parquet").mode("append").save()
    val a = scan(csv).orderBy("k").collect()
    val b = scan(pq).orderBy("k").collect()
    assert(a.length == 50 && a.sameElements(b))
    val r = a(13)
    assert(r.getTimestamp(0) == java.sql.Timestamp.from(
      java.time.Instant.parse("2024-03-01T13:00:00Z")))
    assert(r.getDecimal(1) == new java.math.BigDecimal("13.13"))
    assert(!r.getBoolean(2))
    // and the two formats' manifest checksums agree (canonical lines)
    val ce = graft.sources.ManifestRead.entries(csv, "manifest.json").head
    val pe = graft.sources.ManifestRead.entries(pq, "manifest.json").head
    assert(ce.checksum == pe.checksum && ce.rows == pe.rows)
  }

  test("timestamp zone maps prune files a time-range probe can't hit") {
    val out = freshDir()
    // 4 appends with disjoint 25-hour ts ranges = 4 files
    (0 until 4).foreach { b =>
      fixture(100).filter(col("k") >= b * 25 && col("k") < (b + 1) * 25)
        .coalesce(1).write.format("graft.sources.ManifestSink")
        .option("path", out).option("format", "parquet")
        .mode("append").save()
    }
    val probe = scan(out).filter(
      "ts >= TIMESTAMP '2024-03-02 04:00:00Z' AND " +
        "ts < TIMESTAMP '2024-03-03 00:00:00Z'") // hours 28..47 = file 2
    assert(probe.count() == 20)
    assert(graft.sources.ManifestScanMetrics.candidateFiles(out) == 4)
    assert(graft.sources.ManifestScanMetrics.plannedFiles(out) == 1,
      "timestamp zone maps must prune the other three files")
  }

  test("pushed equality on decimal and boolean evaluates exactly") {
    val out = freshDir()
    fixture(50).coalesce(1).write.format("graft.sources.ManifestSink")
      .option("path", out).option("format", "parquet")
      .mode("append").save()
    assert(scan(out).filter("amt = 7.07").count() == 1)
    assert(scan(out).filter("amt = 7.0700").count() == 1, "value equality")
    assert(scan(out).filter("flag = true").count() == 25)
    assert(scan(out).filter("flag = false").count() == 25)
    assert(scan(out).filter("ts = TIMESTAMP '2024-03-01T05:00:00Z'")
      .count() == 1)
  }

  test("csv→parquet compaction conserves typed tables exactly") {
    val out = freshDir()
    fixture(40).coalesce(1).write.format("graft.sources.ManifestSink")
      .option("path", out).mode("append").save()
    fixture(80).filter(col("k") >= 40)
      .coalesce(1).write.format("graft.sources.ManifestSink")
      .option("path", out).mode("append").save()
    val before = scan(out).orderBy("k").collect()
    // conversion passes the internal row+checksum conservation guard
    graft.sources.ManifestMaintenance.compact(
      spark, out, Ddl, targetFiles = 1, format = "parquet")
    val after = scan(out).orderBy("k").collect()
    assert(after.length == 80 && before.sameElements(after))
    val files = graft.sources.ManifestRead.files(out, "manifest.json")
    assert(files.length == 1 && files.head._1.endsWith(".parquet"))
  }
}
