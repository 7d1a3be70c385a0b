package graft

import org.scalatest.funsuite.AnyFunSuite

/** q258 perceptual-hash near-dup THROUGH the real codec: planted
  * payload corpus (exact dups, a 1-byte edit, empties) plus a
  * brute-force replay of the banded pipeline against the same
  * aHash-through-PNG hash the query computes. */
class PhashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ahash(text: String): (Long, Long) =
    operators.MultimodalOps.aHash32x24(
      operators.MultimodalOps.tiledPixels(text.getBytes("UTF-8"), 768))

  test("q258 finds exactly the brute-force hamming<=3 pairs on planted payloads") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog", // exact dup -> hamming 0
      "the quick brown fox jumps over the lazy cog", // 1-byte edit
      "a completely different document about spark physical planning",
      "", // empty payload
      "", // second empty -> hamming 0 pair
      "short one",
      "tiny")
    val dir = java.nio.file.Files.createTempDirectory("graft_phash").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "spec", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val hs = texts.indices.map(i => i.toLong -> ahash(texts(i)))
    val expected = (for {
      i <- hs.indices; j <- (i + 1) until hs.length
      d = java.lang.Long.bitCount(hs(i)._2._1 ^ hs(j)._2._1) +
        java.lang.Long.bitCount(hs(i)._2._2 ^ hs(j)._2._2)
      if d <= 3
    } yield (hs(i)._1, hs(j)._1, d)).toSet
    assert(expected.nonEmpty, "planted corpus produced no near-dup pairs")
    assert(expected.exists(_._3 == 0), "no exact-dup pair planted")

    val got = SparkEntry.queries("q258_phash_neardup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === expected)
  }

  test("aHash32x24 is deterministic and 32-bit-half bounded") {
    val (hi, lo) = ahash("any payload at all")
    assert((hi, lo) === ahash("any payload at all"))
    // each half holds 32 bits: non-negative and < 2^32
    assert(hi >= 0L && hi < (1L << 32))
    assert(lo >= 0L && lo < (1L << 32))
  }
}
