package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q345 CMS join estimate, q346 quarantine, q347 FD validation. */
class ModernOps19Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q345 estimate dominates the truth and matches a bucket replay") {
    val r = SparkEntry.queries("q345_cms_join_size_estimate")(spark, dir)
      .head()
    val (truth, est, overBp) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(truth > 0 && est >= truth,
      "CM inner product can never under-estimate the join size")
    assert(overBp === (est - truth) * 10000 / truth)
    // replay: bucket-count both sides with the same hash family
    val li = Tables.load(spark, dir, "lineitem")
      .filter(col("l_partkey").isNotNull)
      .select("l_partkey").collect().map(_.getLong(0))
    val pa = Tables.load(spark, dir, "part")
      .filter(col("p_partkey").isNotNull)
      .select("p_partkey").collect().map(_.getLong(0))
    import operators.SketchOps.{Depth, Width, P, cmsA, cmsB}
    val want = (0 until Depth).map { i =>
      def bkt(x: Long) =
        (java.lang.Math.floorMod(cmsA(i) * x + cmsB(i), P) % Width).toInt
      val ca = li.groupBy(bkt).map { case (b, xs) => b -> xs.size.toLong }
      val cb = pa.groupBy(bkt).map { case (b, xs) => b -> xs.size.toLong }
      ca.map { case (b, c) => c * cb.getOrElse(b, 0L) }.sum
    }.min
    assert(est === want, "estimate differs from the direct bucket replay")
  }

  test("q346 masks are exact on a crafted dirty fixture") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_q346_fix").toString
    val schema = Tables.load(spark, dir, "events").schema
    val rows = Seq(
      // (event_id, ts, user_id, event_type, value, props) in the
      // fixture's column ORDER — read back by name, so build via SQL
      ("ok", 1L, "2024-01-01 10:00:00", 7L, "view", 5.0),
      ("bad_value", 2L, "2024-01-01 10:00:01", 7L, "view", -1.0),
      ("bad_type", 3L, "2024-01-01 10:00:02", 7L, "weird", 5.0),
      ("bad_user", 4L, "2024-01-01 10:00:03", -2L, "click", 5.0),
      ("all_bad", 5L, null, null, "weird", -3.0))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (_, id, ts, u, t, v) =>
        org.apache.spark.sql.Row(id,
          if (ts == null) null else java.sql.Timestamp.valueOf(ts),
          u.asInstanceOf[Any], t, v, "{}")
      }),
      org.apache.spark.sql.types.StructType(schema.fields.toIndexedSeq))
    df.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = SparkEntry.queries("q346_quality_quarantine")(spark, tmp)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got === Map(
      0L -> (1L, 1L),   // ok
      1L -> (1L, 2L),   // bad_value
      2L -> (1L, 3L),   // bad_type
      8L -> (1L, 4L),   // bad_user
      15L -> (1L, 5L))) // all four rules at once
  }

  test("q347 classifies holding and violated dependencies correctly") {
    val rows = SparkEntry.queries("q347_fd_validation")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toMap
    assert(rows("nation.key->region")._4 === true,
      "the nation->region FD must hold")
    assert(rows("nation.key->region")._2 === 0L)
    assert(rows("events.user->type")._4 === false,
      "users emit several event types — the FD must be violated")
    assert(rows("events.user->type")._3 > 1)
    // replay the documents FD
    val bySource = Tables.load(spark, dir, "documents")
      .filter(col("source").isNotNull && col("lang").isNotNull)
      .select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (s0, xs) => s0 -> xs.map(_._2).toSet.size }
    val d = rows("documents.source->lang")
    assert(d._1 === bySource.size.toLong)
    assert(d._2 === bySource.count(_._2 > 1).toLong)
    assert(d._3 === bySource.values.max.toLong)
  }
}
