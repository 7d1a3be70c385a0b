package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q359 frequent sequences, q360 skew advisor, q361 equi-depth hist. */
class ModernOps25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q359 supports equal an independent subsequence-containment scan") {
    val sessions = Tables.load(spark, dir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_type").isNotNull)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => ((r.getLong(0),
        r.getTimestamp(1).toLocalDateTime.toLocalDate),
        (r.getTimestamp(1).getTime, r.getLong(2),
          r.getString(3).substring(0, 1))))
      .groupBy(_._1).values
      .map(_.map(_._2).sortBy(x => (x._1, x._2)).map(_._3).mkString)
      .toSeq
    // independent containment: two-pointer subsequence test, no regex
    def contains(s: String, pat: String): Boolean = {
      var i = 0
      s.foreach { ch => if (i < pat.length && ch == pat(i)) i += 1 }
      i == pat.length
    }
    val letters = Seq("c", "e", "p", "s", "v")
    val cands = letters ++
      (for (a <- letters; b <- letters) yield a + b) ++
      (for (a <- letters; b <- letters; c <- letters) yield a + b + c)
    val want = cands.map { p =>
      p -> sessions.count(contains(_, p)).toLong
    }.filter(_._2 > 0).toMap
    val got = SparkEntry.queries("q359_frequent_sequences")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.view.mapValues(_._2).toMap === want)
    got.foreach { case (seq, (len, sup, bp)) =>
      assert(len === seq.length.toLong)
      assert(bp === sup * 10000 / sessions.size)
      // Apriori monotonicity: a pattern never out-supports its prefix
      if (seq.length > 1)
        assert(sup <= got(seq.dropRight(1))._2, s"anti-monotone at $seq")
    }
  }

  test("q360 advisor stats match a direct key-count replay") {
    val counts = Tables.load(spark, dir, "lineitem")
      .filter(col("l_suppkey").isNotNull)
      .select("l_suppkey").collect().map(_.getLong(0))
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val sortedCnt = counts.toSeq.sortBy(x => (x._2, x._1)).map(_._2)
    val (nKeys, total, maxCnt) =
      (counts.size.toLong, sortedCnt.sum, sortedCnt.max)
    val r = SparkEntry.queries("q360_skew_advisor")(spark, dir).head()
    assert(r.getLong(0) === nKeys)
    assert(r.getLong(1) === total)
    assert(r.getLong(2) === maxCnt)
    assert(r.getLong(3) ===
      counts.toSeq.sortBy(x => (-x._2, x._1)).head._1)
    assert(r.getLong(4) === sortedCnt(((nKeys + 1) / 2).toInt - 1))
    assert(r.getLong(5) === sortedCnt(((nKeys * 99 + 99) / 100).toInt - 1))
    assert(r.getLong(6) === maxCnt * nKeys * 10000 / total)
    val target = (total + 31) / 32
    assert(r.getLong(7) === (maxCnt + target - 1) / target)
  }

  test("q361 buckets replay the exact ntile allocation") {
    val vals = Tables.load(spark, dir, "orders")
      .filter(col("o_totalprice").isNotNull && col("o_orderkey").isNotNull)
      .select("o_totalprice", "o_orderkey").collect()
      .map(r => ((BigDecimal(r.getDouble(0)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP) * 100).toLong, r.getLong(1)))
      .sortBy(identity)
    val n = vals.length
    val (q, rem) = (n / 16, n % 16)
    val buckets = vals.zipWithIndex.map { case ((c, _), i) =>
      val b = if (i < (q + 1) * rem) i / (q + 1) + 1
        else rem + (i - (q + 1) * rem) / q + 1
      (b.toLong, c)
    }
    val want = buckets.groupBy(_._1).map { case (b, xs) =>
      b -> (xs.length.toLong, xs.map(_._2).min, xs.map(_._2).max,
        xs.map(_._2).distinct.length.toLong)
    }
    val got = SparkEntry.queries("q361_equidepth_histogram")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === want)
    // equi-depth: bucket sizes differ by at most one
    val sizes = got.values.map(_._1)
    assert(sizes.max - sizes.min <= 1)
    // bucket ranges are non-overlapping and ordered
    val ordered = got.toSeq.sortBy(_._1).map(_._2)
    ordered.sliding(2).foreach {
      case Seq((_, _, hi1, _), (_, lo2, _, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }
}
