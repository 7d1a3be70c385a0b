package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q368 embedding drift, q369 gains chart. */
class ModernOps28Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def vectors = Tables.load(spark, dir, "embeddings")
    .filter(col("vec_id").isNotNull && col("label").isNotNull &&
      col("embedding").isNotNull)
    .collect()
    .map(r => (r.getLong(0), r.getInt(2),
      r.getSeq[Float](1).toArray))

  test("q368 L1 numerators match a plain-Scala centroid replay") {
    def quant(f: Float): Long =
      math.min(math.max(math.floor(f.toDouble * 10000), -1e7), 1e7).toLong
    val vs = vectors.filter(_._3.length == 64)
    val byLabel = vs.groupBy(_._2)
    val want = byLabel.map { case (lab, xs) =>
      val (a, b) = xs.partition(_._1 % 2 == 0)
      val l1 = (0 until 64).map { i =>
        val sa = a.map(v => quant(v._3(i))).sum
        val sb = b.map(v => quant(v._3(i))).sum
        math.abs(sa * b.length - sb * a.length)
      }.sum
      lab.toLong -> (a.length.toLong, b.length.toLong, l1)
    }
    val got = SparkEntry.queries("q368_embedding_drift")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q369 deciles replay the rank allocation and conserve positives") {
    val vs = vectors
    val ranked = vs.map(v => (v._3(0), v._1, if (v._2 == 0) 1L else 0L))
      .sortBy { case (s, id, _) => (-s, id) }
    val n = ranked.length
    val tp = ranked.map(_._3).sum
    val want = ranked.zipWithIndex
      .groupBy { case (_, i) => i.toLong * 10 / n + 1 }
      .map { case (d, xs) =>
        d -> (xs.length.toLong, xs.map(_._1._3).sum) }
    val got = SparkEntry.queries("q369_gains_chart")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.map(_._1).toSeq === (1L to 10L))
    var cum = 0L
    got.foreach { case (d, dn, dp, cp, recall, lift) =>
      assert((dn, dp) === want(d), s"at decile $d")
      cum += dp
      assert(cp === cum)
      assert(recall === cum * 10000 / tp)
      assert(lift === dp * n * 10000 / (dn * tp))
    }
    assert(cum === tp, "cumulative recall must end at every positive")
    // top decile of a label-correlated score should not lag the bottom
    assert(got.head._6 >= 0 && got.map(_._2).sum === n)
  }
}
