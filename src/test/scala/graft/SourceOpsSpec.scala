package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source/format surface (q171/q172, q176): roundtrip losslessness and
  * schema-evolution semantics pinned beyond the aggregate oracles. */
class SourceOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf

  test("q171 CSV roundtrip is lossless row-by-row, not just in aggregate") {
    import org.apache.spark.sql.functions._
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")
    val out = s"/tmp/graft_csv_spec_${math.abs(dir.hashCode)}"
    li.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.schema(li.schema).option("header", "true").csv(out)
    assert(back.count() == li.count())
    // anti-join both ways: any lossy cell surfaces as an unmatched row
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty,
      "CSV write/read changed at least one row")
    assert(back.schema == li.schema)
  }

  test("q172 merged read nulls exactly the columns each batch predates") {
    val got = SparkEntry.queries("q172_schema_evolution")(spark, dir).collect()
    val n = Tables.load(spark, dir, "documents").count()
    assert(got.length == n)
    got.foreach { r =>
      val id = r.getLong(0)
      if (id % 2 == 0) {
        assert(!r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3), s"doc $id (old schema)")
      } else {
        assert(r.isNullAt(1) && !r.isNullAt(2) && !r.isNullAt(3), s"doc $id (new schema)")
      }
    }
  }

  test("q176 stream-static enrichment equals the batch join") {
    import org.apache.spark.sql.functions._
    val expected = Tables.load(spark, dir, "events")
      .join(Tables.load(spark, dir, "customer"),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = SparkEntry.queries("q176_stream_static_join")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got.values.sum == Tables.load(spark, dir, "events").count(),
      "enrichment dropped events (user_id outside the dimension?)")
  }
}
