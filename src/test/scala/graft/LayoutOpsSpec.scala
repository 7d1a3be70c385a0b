package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q391 z-values interleave bits and buckets are disjoint z-ranges") {
    // hand-computed Morton codes: spread(3)=5, spread(5)=17 -> z=5|34=39
    Tables.registerAll(spark, dir)
    val z = spark.sql(
      """SELECT l_partkey % 65536 AS d1, l_suppkey % 65536 AS d2 FROM lineitem
        |LIMIT 0""".stripMargin) // just to ensure registration
    def morton(d1: Long, d2: Long): Long = {
      def spread(x0: Long): Long = {
        var x = x0
        x = (x | (x << 8)) & 0x00ff00ffL
        x = (x | (x << 4)) & 0x0f0f0f0fL
        x = (x | (x << 2)) & 0x33333333L
        x = (x | (x << 1)) & 0x55555555L
        x
      }
      spread(d1) | (spread(d2) << 1)
    }
    assert(morton(3, 5) == 39L)
    assert(morton(0, 1) == 2L)
    assert(morton(65535, 0) == 0x55555555L)
    val rows = SparkEntry.queries("q391_zorder_layout")(spark, dir).collect()
    assert(rows.length == 32)
    // contiguous, ordered, non-overlapping z ranges
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) <= b.getLong(2),
        s"bucket ${a.getInt(0)} z_hi > bucket ${b.getInt(0)} z_lo")
    }
    // z-order locality: the average bucket bounding box must cover far
    // less than the full (d1 x d2) domain — the one-dimensional sort
    // would leave one dimension spanning ~everything in every bucket
    // (area, not per-dimension: at sf0.001 the supplier dimension has
    // only ~10 distinct values, so buckets necessarily span most of it)
    val avgArea = rows.map(r =>
      (r.getLong(5) - r.getLong(4) + 1).toDouble *
        (r.getLong(7) - r.getLong(6) + 1)).sum / 32.0
    val domainArea =
      (rows.map(_.getLong(5)).max - rows.map(_.getLong(4)).min + 1).toDouble *
        (rows.map(_.getLong(7)).max - rows.map(_.getLong(6)).min + 1)
    assert(avgArea < 0.5 * domainArea,
      s"no locality: avg bucket area $avgArea vs domain $domainArea")
  }

  test("q392 profile agrees with direct per-column queries") {
    val prof = SparkEntry.queries("q392_table_profile")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    Tables.registerAll(spark, dir)
    val n = spark.sql("SELECT count(*) FROM orders").head().getLong(0)
    val ndvStatus = spark.sql(
      "SELECT count(DISTINCT o_orderstatus) FROM orders").head().getLong(0)
    val nullKeys = spark.sql(
      "SELECT count(*) FROM orders WHERE o_orderkey IS NULL").head().getLong(0)
    assert(prof("o_orderstatus")._1 == n)
    assert(prof("o_orderstatus")._3 == ndvStatus)
    assert(prof("o_orderkey")._2 == nullKeys)
    assert(prof.size == 6)
  }
}
