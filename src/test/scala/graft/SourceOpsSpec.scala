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

  test("q183 DPP result equals the plain filtered aggregate") {
    import org.apache.spark.sql.functions._
    val li = Tables.load(spark, dir, "lineitem")
      .select(year(col("l_shipdate")).as("y"), col("l_extendedprice")).collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
    val years = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        year(col("o_orderdate")) % 3 === 0)
      .select(year(col("o_orderdate"))).collect().map(_.getInt(0)).toSet
    val expected = li.filter(x => years(x._1)).groupBy(_._1).map { case (y, g) =>
      y -> ((g.length.toLong,
        g.map(x => BigDecimal(x._2).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble))
    }
    val got = SparkEntry.queries("q183_dynamic_partition_pruning")(spark, dir)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == expected)
    // the dim filter must actually prune: strictly fewer years than exist
    val allYears = li.map(_._1).toSet
    assert(years.nonEmpty && (allYears -- years).nonEmpty, "DPP fixture degenerate")
  }

  test("q184 try_* semantics: NULL on bad input, never an exception") {
    val rows = SparkEntry.queries("q184_try_arithmetic")(spark, dir).collect()
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_linenumber", "l_discount", "l_returnflag").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getString(2)))
    rows.foreach { r =>
      val g = li.filter(_._1 == r.getInt(0))
      assert(r.getLong(1) == g.length.toLong)
      // any_ratio is true iff some row has a non-zero divisor
      assert(r.getBoolean(2) == g.exists(_._2 != 0.0))
      // R/A/N flags never parse as ints
      assert(r.getLong(3) == g.length.toLong)
    }
  }

  test("q188 path-derived provenance matches column-derived truth per row") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q188_file_provenance")(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L until 8L), "one row per bucket")
    assert(rows.forall(_.getLong(5) == 0L), "path/column bucket mismatch")
    assert(rows.map(_.getLong(1)).sum ==
      Tables.load(spark, dir, "documents").count(), "provenance dropped rows")
    // the roundtrip dataset really is multi-file: every row's file path
    // carries a bucket= partition dir, and all 8 dirs appear
    val out = s"/tmp/graft_provenance_${math.abs(dir.hashCode)}"
    val paths = spark.read.parquet(out)
      .select(input_file_name().as("f")).distinct().collect().map(_.getString(0))
    assert(paths.forall(_.contains("bucket=")))
    assert(paths.map(p => p.substring(p.indexOf("bucket="))
      .split("/")(0)).distinct.length == 8)
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

  test("q194 binaryFile read-back matches plain-Scala byte counts and digests") {
    import org.apache.spark.sql.functions.{col, length}
    val expected = Tables.load(spark, dir, "documents")
      .filter(col("doc_id") <= 100 && length(col("text")) > 0)
      .select("doc_id", "text").collect()
      .map { r =>
        val bytes = r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        r.getLong(0) -> ((bytes.length.toLong, md.map("%02x".format(_)).mkString))
      }.toMap
    val got = SparkEntry.queries("q194_binaryfile_source")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q194 pin: binaryFile emits NO row for a zero-length file") {
    val d = new java.io.File("/tmp/graft_q194_emptypin")
    if (d.exists()) d.listFiles().foreach(_.delete())
    d.mkdirs()
    java.nio.file.Files.write(new java.io.File(d, "empty.bin").toPath, Array[Byte]())
    java.nio.file.Files.write(new java.io.File(d, "one.bin").toPath, Array[Byte](42))
    val rows = spark.read.format("binaryFile").load(d.toString).collect()
    assert(rows.length == 1, "zero-length files must be absent from the source output")
    assert(rows.head.getAs[Long]("length") == 1L)
  }

  test("q237 quarantines exactly the three malformed lines, salvages the rest") {
    val dir = "/root/testdata/sf0.001"
    val nation = Tables.load(spark, dir, "nation")
      .selectExpr("CAST(n_nationkey AS BIGINT)", "CAST(n_regionkey AS BIGINT)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val got = SparkEntry.queries("q237_csv_corrupt_records")(spark, dir)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).head
    assert(got === ((nation.length.toLong, 3L,
      nation.map(_._1).sum, nation.map(_._2).distinct.length.toLong)))
  }
}
