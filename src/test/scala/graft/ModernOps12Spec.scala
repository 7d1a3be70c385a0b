package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q322 log-bucket quantile sketch, q323 sorted-neighborhood dedup,
  * q324 sequence pattern match. */
class ModernOps12Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q322 sketch bucket always contains the exact quantile, with " +
    "bounded relative width") {
    val rows = SparkEntry.queries("q322_logbucket_quantile_sketch")(
      spark, dir).collect()
    assert(rows.length === 9) // 3 flags x 3 quantiles
    rows.foreach { r =>
      val (lo, hi, exact, contained) =
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))
      assert(contained && exact >= lo && exact <= hi)
      // top-5-bit mantissa buckets: width/lo <= 1/16
      assert((hi - lo).toDouble <= lo.toDouble / 16 + 1,
        s"bucket [$lo,$hi] wider than the 1/16 relative-error contract")
    }
  }

  test("q322 sketch state is bounded by #flags x #buckets, not rows") {
    // distinct bucket count per flag can never exceed 32 sub-buckets
    // per octave x 64 octaves regardless of input size
    val vp = Tables.load(spark, dir, "lineitem")
      .select((col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("long").as("cents"))
      .filter(col("cents") > 0)
      .withColumn("bucket", expr(
        "length(bin(cents)) * 32" +
          " + shiftright(cents, greatest(length(bin(cents)) - 5, 0))"))
    val n = vp.count()
    val nBuckets = vp.select("bucket").distinct().count()
    assert(nBuckets < 200 && n > 1000,
      s"sketch must compress: $nBuckets buckets over $n rows")
  }

  test("q323 SNM candidates are exactly the <=5-gap neighbors in key " +
    "order and every true near-dup with shared rare tokens is found") {
    val got = SparkEntry.queries("q323_sorted_neighborhood_dedup")(
      spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // replay: rank tokens, key docs, sort, windowed pairs, jaccard
    val toks = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (id, ws) => id -> ws.map(_._2).toSet }
    val freq = toks.values.flatten.groupBy(identity).map {
      case (w, xs) => w -> xs.size }
    val rank = freq.toSeq.sortBy { case (w, f) => (f, w) }
      .zipWithIndex.map { case ((w, _), i) => w -> (i + 1L) }.toMap
    val keyed = toks.map { case (id, ws) =>
      val rs = ws.map(rank).toSeq.sorted
      (id, rs, rs.head * 1000000L + rs.drop(1).headOption.getOrElse(0L))
    }.toSeq.sortBy { case (id, _, k) => (k, id) }
    val want = (for {
      i <- keyed.indices; j <- (i + 1) until math.min(i + 6, keyed.size)
      (d1, r1, _) = keyed(i); (d2, r2, _) = keyed(j)
      ni = (r1.toSet & r2.toSet).size.toLong
      nu = r1.size + r2.size - ni
    } yield (d1, d2, (j - i).toLong, ni * 100 / nu)).toSet
    assert(got.toSet === want,
      s"SNM pair set mismatch (got ${got.length}, want ${want.size})")
    // the fixture's near-dup docs must surface with high jaccard
    assert(got.exists(_._4 >= 80), "no high-jaccard neighbor found")
  }

  test("q324 funnel counts match a hand computation per user-day") {
    val rows = SparkEntry.queries("q324_sequence_pattern_match")(
      spark, dir).collect()
    assert(rows.nonEmpty)
    val byKey = Tables.load(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"), col("ts"),
        col("event_id"), substring(col("event_type"), 1, 1).as("c"))
      .collect()
      .map(r => ((r.getLong(0), r.getDate(1)),
        (r.getTimestamp(2), r.getLong(3), r.getString(4))))
      .groupBy(_._1)
    val pat = "v[cv]*p".r
    var funnelSeen = false
    rows.foreach { r =>
      val key = (r.getLong(0), r.getDate(1))
      val seq = byKey(key).map(_._2)
        .sortBy { case (ts, id, _) => (ts.getTime, ts.getNanos, id) }
        .map(_._3).mkString
      assert(r.getLong(2) === seq.length.toLong, s"seq_len at $key")
      val matches = pat.findAllIn(seq).toSeq
      assert(r.getLong(3) === matches.size.toLong, s"n_funnels at $key")
      assert(r.getString(4) === matches.headOption.getOrElse(""),
        s"first_funnel at $key")
      funnelSeen ||= matches.nonEmpty
    }
    assert(funnelSeen, "fixture must contain at least one funnel match")
  }
}
