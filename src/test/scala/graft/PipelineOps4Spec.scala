package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-6 pipeline operators, part 4 (q203-q206): independent
  * plain-Scala recomputations at sf0.001 so the DuckDB oracles aren't
  * the only line of defense. */
class PipelineOps4Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def docWords(): Array[(Long, String, Array[String])] =
    Tables.load(spark, dir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ").filter(_.nonEmpty)))
      .sortBy(_._1)

  test("q203 packing report equals a sequential concatenate-and-cut fold") {
    val C = 256
    // Sequential replay: walk each shard in doc_id order keeping a
    // running token offset; a doc crosses when it straddles a C cut.
    val expected = docWords().filter(_._3.nonEmpty).groupBy(_._2).map {
      case (src, ds) =>
        var off = 0L; var crosses = 0L; var total = 0L
        ds.sortBy(_._1).foreach { case (_, _, ws) =>
          val tok = ws.length.toLong
          if ((off + tok - 1) / C > off / C) crosses += 1
          off += tok; total += tok
        }
        val nSeq = (total + C - 1) / C
        src -> (ds.length.toLong, total, nSeq, crosses, nSeq * C - total)
    }
    val got = SparkEntry.queries("q203_sequence_pack")(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got === expected)
  }

  test("q204 span coverage equals a brute-force shingle map (interval union)") {
    val W = 8
    val ds = docWords().map { case (id, _, ws) => id -> ws }
      .filter(_._2.length >= W)
    val shingles = ds.map { case (id, ws) =>
      id -> ws.sliding(W).map(_.mkString(" ")).toArray
    }
    val docsPerShingle = shingles
      .flatMap { case (id, ss) => ss.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (sh, g) => sh -> g.length }
    val expected = shingles.map { case (id, ss) =>
      val n = ds.toMap.apply(id).length.toLong
      val dupStarts = ss.zipWithIndex.collect {
        case (sh, i) if docsPerShingle(sh) >= 2 => i
      }
      val covered = dupStarts.flatMap(i => i until i + W).distinct.length.toLong
      id -> (n, dupStarts.length.toLong, covered, covered * 10000 / n)
    }.toMap
    val got = SparkEntry.queries("q204_dup_ngram_spans")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got === expected)
    // the metric must be non-trivial on the fixture: some doc shares a
    // duplicated span, and no doc exceeds full coverage
    assert(got.values.exists(_._3 > 0))
    assert(got.values.forall { case (n, _, cov, _) => cov <= n })
  }

  test("q205 variant roundtrip equals the direct base-table aggregate") {
    import org.apache.spark.sql.functions._
    val direct = Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("string")
          .as("sum_price"),
        countDistinct("o_custkey").as("n_customers"))
      .orderBy("status").collect().map(_.toSeq)
    val viaVariant = SparkEntry.queries("q205_variant_shred")(spark, dir)
      .collect().map(_.toSeq)
    assert(viaVariant === direct)
  }

  test("q206 pipe syntax produces the same rows as the classic form") {
    Tables.registerAll(spark, dir)
    val classic = spark.sql(
      """SELECT l_returnflag, count(*) AS n_items,
        |  cast(sum(cast(l_quantity AS DECIMAL(12,2))) AS STRING) AS sum_qty,
        |  cast(sum(cast(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS sum_price
        |FROM lineitem WHERE l_quantity > 10
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .collect().map(_.toSeq)
    val piped = SparkEntry.queries("q206_pipe_syntax")(spark, dir)
      .collect().map(_.toSeq)
    assert(piped === classic)
  }
}
