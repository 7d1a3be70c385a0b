package graft

import org.scalatest.funsuite.AnyFunSuite

/** Truncated UTF-8 byte bounds on string columns (q426's mechanism):
  * correctness on the adversarial shapes — multi-byte characters,
  * surrogate pairs (where Java UTF-16 order and Spark UTF-8 order
  * DISAGREE), values longer than the truncation width (exclusive
  * successor bounds), and the all-0xFF-prefix case must never lose a
  * row to pruning; and the pruning must actually skip provably-dead
  * files.
  */
class StringBoundsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import graft.sources.ManifestStrBounds

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_sbnd").toString
    new java.io.File(d).delete()
    d
  }

  private def write(path: String, vs: Seq[String]): Unit = {
    import spark.implicits._
    vs.toDF("v").coalesce(1).write.format("graft.sources.ManifestSink")
      .option("path", path).mode("append").save()
  }

  private def scan(path: String) =
    spark.read.format("graft.sources.ManifestSource")
      .schema("v STRING").option("path", path).load()

  test("succ: carry over 0xFF bytes; None when all 0xFF") {
    assert(ManifestStrBounds.succ(Array[Byte](0x61)).get.toSeq == Seq[Byte](0x62))
    assert(ManifestStrBounds.succ(Array[Byte](0x61, -1)).get.toSeq == Seq[Byte](0x62))
    assert(ManifestStrBounds.succ(Array[Byte](-1, -1)).isEmpty)
  }

  test("no row loss on multi-byte / surrogate / long / 0xFF-ish strings") {
    // U+1D54A (surrogate pair) sorts ABOVE U+FFFD in UTF-8 code-point
    // order but BELOW it in Java UTF-16 order — the classic trap.
    val tricky = Seq(
      "plain", "Pläin", "中文文本", "𝕊-set",
      "�-replacement", "x" * 40, "x" * 15 + "￿" * 8,
      "longer-than-sixteen-bytes-value", " ", "\u0001-ctl",
      "pref", "prefix", "prefixed-long-value-here")
    val path = freshDir()
    write(path, tricky.take(7)); write(path, tricky.drop(7))
    val all = scan(path).collect().map(_.getString(0)).toSet
    assert(all == tricky.toSet)
    // every single-value equality and range probe returns exactly the
    // rows Spark's own semantics say — compare against an in-memory DF
    import spark.implicits._
    val ref = tricky.toDF("v")
    for (pivot <- tricky) {
      def rows(df: org.apache.spark.sql.DataFrame,
          f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
        df.filter(f(org.apache.spark.sql.functions.col("v")))
          .collect().map(_.getString(0)).sorted.toSeq
      assert(rows(scan(path), _ >= pivot) == rows(ref, _ >= pivot),
        s">= ${pivot.take(20)}")
      assert(rows(scan(path), _ < pivot) == rows(ref, _ < pivot),
        s"< ${pivot.take(20)}")
      assert(rows(scan(path), _ === pivot) == rows(ref, _ === pivot),
        s"= ${pivot.take(20)}")
    }
    // prefix probes (byte-prefix = char-prefix in UTF-8)
    for (p <- Seq("pref", "prefix", "x", "𝕊", "long")) {
      val got = scan(path).filter(org.apache.spark.sql.functions
        .col("v").startsWith(p)).collect().map(_.getString(0)).sorted.toSeq
      val want = tricky.filter(_.startsWith(p)).sorted
      assert(got == want, s"prefix $p: $got != $want")
    }
  }

  test("range probes actually skip provably-dead files") {
    val path = freshDir()
    write(path, Seq("alpha", "beta"))
    write(path, Seq("gamma", "delta"))
    write(path, Seq("zeta", "zulu"))
    def planned(df: org.apache.spark.sql.DataFrame): Long = {
      df.queryExecution.toRdd.getNumPartitions
      graft.sources.ManifestScanMetrics.plannedFiles(path)
    }
    import org.apache.spark.sql.functions.col
    // only file 3 holds values >= "z"
    assert(planned(scan(path).filter(col("v") >= "z")) == 1L)
    // only file 1 holds values < "b"
    assert(planned(scan(path).filter(col("v") < "b")) == 1L)
    // prefix "de" lives only in file 2
    assert(planned(scan(path).filter(col("v").startsWith("de"))) == 1L)
    // a range nothing matches plans zero files
    assert(planned(scan(path).filter(col("v") >= "zzz")) == 0L)
  }

  test("old manifests without string bounds still parse and never prune") {
    // simulate a pre-round-13 stats block (nulls + bloom only)
    val st = graft.sources.ManifestRead.parseStats(
      """{"v":{"nulls":0,"bloom":"AAAA"}}""")("v")
    assert(st.slo.isEmpty && st.shi.isEmpty && st.bloom.isDefined)
  }
}
