package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q370 consistent hashing, q371 class rebalance. */
class ModernOps29Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private val M = 4294967296L
  private def h(x: Long): Long = Math.floorMod(x * 2654435761L, M)

  test("q370 movement equals a plain-Scala ring replay") {
    val keys = Tables.load(spark, dir, "documents")
      .filter(col("doc_id").isNotNull)
      .select("doc_id").collect().map(_.getLong(0))
    def ring(shards: Int) =
      for (sh <- 0 until shards; v <- 0 until 4)
        yield (sh, sh * 4 + v, Math.floorMod(
          (sh.toLong * 1009 + v.toLong * 9176 + 1) * 2654435761L, M))
    def assign(k: Long, r: Seq[(Int, Int, Long)]): Int =
      r.minBy { case (_, nid, pos) =>
        Math.floorMod(pos - h(k), M) * 1048576L + nid }._1
    val (ra, rb) = (ring(16), ring(20))
    val movedRing = keys.count(k => assign(k, ra) != assign(k, rb)).toLong
    val movedMod = keys.count(k =>
      Math.floorMod(k, 16) != Math.floorMod(k, 20)).toLong
    val r = SparkEntry.queries("q370_consistent_hashing")(spark, dir)
      .head()
    assert(r.getLong(0) === keys.length.toLong)
    assert(r.getLong(1) === movedMod)
    assert(r.getLong(2) === movedRing)
    assert(r.getLong(3) === movedMod * 10000 / keys.length)
    assert(r.getLong(4) === movedRing * 10000 / keys.length)
    assert(movedRing < movedMod,
      "the ring must move fewer keys than mod — that's its point")
  }

  test("q371 keeps exactly the minority size per class, by hash order") {
    val docs = Tables.load(spark, dir, "documents")
      .filter(col("doc_id").isNotNull && col("lang").isNotNull)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byLang = docs.groupBy(_._2)
    val m = byLang.values.map(_.length).min
    val want = byLang.map { case (lang, xs) =>
      val kept = xs.map(_._1).sortBy(id => (h(id), id)).take(m)
      lang -> (xs.length.toLong, kept.length.toLong,
        kept.map(id => Math.floorMod(id, 1000003L)).sum)
    }
    val got = SparkEntry.queries("q371_class_rebalance")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === want)
    assert(got.values.forall(_._2 == m.toLong),
      "every class must land at the minority size")
  }
}
