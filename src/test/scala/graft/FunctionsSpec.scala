package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit specs for the custom Catalyst expressions, checked against plain
  * Scala reference computations through the SQL surface (registered
  * functions), including codegen vs interpreted agreement. */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("graft_dot equals sequential fold, bit-exact") {
    functions.GraftFunctions.register(spark)
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.1, -0.2), Array(0.3, 0.7)),
      (Array.empty[Double], Array.empty[Double])
    ).toDF("a", "b")
    val got = df.selectExpr("graft_dot(a, b)").as[Double].collect()
    val exp = Seq(
      1.0 * 4.0 + 2.0 * 5.0 + 3.0 * 6.0,
      0.1 * 0.3 + -0.2 * 0.7,
      0.0)
    assert(got.toSeq == exp)
  }

  test("graft_dot interpreted eval matches codegen") {
    val e = functions.DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.5, 2.5), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(2.0, 4.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    assert(e.eval(null) == 1.5 * 2.0 + 2.5 * 4.0)
  }

  test("graft_shingles3 produces distinct word 3-grams in order") {
    functions.GraftFunctions.register(spark)
    val got = Seq("a b c d a b c d", "x y", "")
      .toDF("text").selectExpr("graft_shingles3(text)")
      .as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d", "c d a", "d a b")) // dups removed
    assert(got(1) == Seq.empty)
    assert(got(2) == Seq.empty)
  }

  test("graft_minhash matches per-permutation array_min formulation") {
    val p = 2038074743L
    val a = Array(3L, 7L)
    val b = Array(11L, 13L)
    val e = functions.MinHashSig(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(5L, 100L, 999999L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)), a, b, p)
    val sig = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    def mh(ai: Long, bi: Long) =
      Seq(5L, 100L, 999999L).map(x => Math.floorMod(ai * x + bi, p)).min
    assert(sig.toSeq == Seq(mh(3, 11), mh(7, 13)))
  }

  test("graft_cms sketch is merge-order independent (1 vs 32 partitions, shuffled)") {
    import graft.operators.SketchOps
    functions.GraftFunctions.register(spark)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms_t",
      exprs => functions.CountMinSketchAgg(
        exprs.head, SketchOps.Depth, SketchOps.Width,
        SketchOps.cmsA, SketchOps.cmsB, SketchOps.P).toAggregateExpression(),
      "scala_udf")
    val keys = (1L to 5000L).map(i => i % 97) // heavy collisions
    def sketch(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
      df.createOrReplaceTempView("cms_in")
      spark.sql("SELECT graft_cms_t(k) AS cms FROM cms_in")
        .head().getSeq[Long](0)
    }
    val one = sketch(keys.toDF("k").repartition(1))
    val many = sketch(scala.util.Random.shuffle(keys).toDF("k").repartition(32))
    assert(one == many, "CMS differs across partitioning / input order")
    assert(one.sum > 0)
  }

  test("graft_polyhash matches the SQL codepoint fold; empty string matches the ORACLE") {
    import org.apache.spark.sql.graftbridge.Bridge
    def poly(df: org.apache.spark.sql.DataFrame) = df.withColumn("h",
        Bridge.column(functions.PolyHash(Bridge.expr(col("w")), 17, 31, 2147483647L)))
      .select("h").as[Long].collect().toSeq
    // Non-empty: bit-identical to the SQL HOF fold it replaced.
    val inputs = Seq("hello", "a", "héllo wörld", "日本語テスト", "emoji 😀 pair")
    val df = inputs.toDF("w")
    val ref = df.selectExpr(
      """aggregate(transform(sequence(1, length(w)),
        |          i -> CAST(ascii(substring(w, i, 1)) AS BIGINT)),
        |  17L, (acc, c) -> (acc * 31 + c) % 2147483647) AS h""".stripMargin)
      .as[Long].collect().toSeq
    assert(poly(df) == ref)
    // Empty token: the old SQL fold hit Spark's descending sequence(1,0)
    // = [1,0] quirk and produced 16337, DIVERGING from the DuckDB
    // oracle's range(1,1) = [] -> seed. PolyHash folds zero codepoints
    // and returns the seed — matching the oracle (latent divergence on
    // any document with consecutive spaces, fixed by this expression).
    assert(poly(Seq("").toDF("w")) == Seq(17L))
  }

  test("graft_nearest_cell: codegen argmin matches HOF formulation, no interpreted HOF in plan") {
    import graft.operators.KMeansLite
    val cents = Array(Array(0.0, 0.0), Array(1.0, 1.0), Array(1.0, 1.0))
    val df = Seq(
      (1L, Array(0.1, 0.2)),
      (2L, Array(0.9, 1.1)),
      (3L, Array(0.5, 0.5)), // equidistant: first strict min -> cell 0
      (4L, Array(0.500000001, 0.5))
    ).toDF("vec_id", "v")
    val assigned = KMeansLite.assign(df, "v", cents)
    // HOF reference: first strict minimum over (d2, cid).
    val centArr = cents.zipWithIndex
      .map { case (c, i) => s"struct($i AS cid, array(${c.mkString(",")}) AS cv)" }
      .mkString("array(", ",", ")")
    val hof = df.withColumn("cell", expr(
      s"""aggregate($centArr, struct(CAST('Infinity' AS DOUBLE) AS d2, -1 AS cid),
         |  (best, c) -> CASE WHEN
         |      aggregate(zip_with(v, c.cv, (a, b) -> (a - b) * (a - b)),
         |                CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) < best.d2
         |    THEN struct(
         |      aggregate(zip_with(v, c.cv, (a, b) -> (a - b) * (a - b)),
         |                CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) AS d2, c.cid AS cid)
         |    ELSE best END).cid""".stripMargin))
    val got = assigned.select("vec_id", "cell").as[(Long, Int)].collect().sortBy(_._1)
    val ref = hof.select("vec_id", "cell").as[(Long, Int)].collect().sortBy(_._1)
    assert(got.toSeq == ref.toSeq)
    assert(got.map(_._2).toSeq == Seq(0, 1, 0, 1))
    // The whole point: no interpreted aggregate/zip_with HOF in the plan.
    // (Analyzed plan: the optimizer folds this LocalRelation input whole;
    // on a parquet source the expression runs inside WholeStageCodegen.)
    val plan = assigned.queryExecution.analyzed.toString
    assert(!plan.contains("aggregate("), "assign plan still uses interpreted HOF")
    assert(plan.contains("graft_nearest_cell"))
    // Interpreted eval path agrees too (codegen fallback safety).
    val e = functions.NearestCell(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(0.9, 1.1), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)), cents)
    assert(e.eval(null) == 1)
  }

  test("graft_topk buffer is insert- and merge-order independent with exact ties") {
    val agg = functions.TopKAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(0.0),
      org.apache.spark.sql.catalyst.expressions.Literal(0L), 3)
    // ties on value (5.0 twice) must resolve by id ASC in every order
    val items = Seq((5.0, 7L), (5.0, 2L), (9.0, 4L), (1.0, 1L), (3.0, 8L), (9.0, 9L))
    val expected = Seq((9.0, 4L), (9.0, 9L), (5.0, 2L))
    val rng = new scala.util.Random(42)
    (0 until 20).foreach { _ =>
      val shuffled = rng.shuffle(items)
      val cut = rng.nextInt(items.length + 1)
      val (l, r) = shuffled.splitAt(cut)
      val b1 = agg.createAggregationBuffer()
      l.foreach(t => agg.merge(b1, scala.collection.mutable.ArrayBuffer(t)))
      val b2 = agg.createAggregationBuffer()
      r.foreach(t => agg.merge(b2, scala.collection.mutable.ArrayBuffer(t)))
      val merged = agg.merge(b1, agg.deserialize(agg.serialize(b2)))
      assert(merged.toSeq == expected, s"order ${shuffled.mkString(",")}")
    }
  }

  test("graft_topk rejects wrong input types at analysis, accepts (DOUBLE, BIGINT)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{DoubleType, LongType, IntegerType, StringType}
    def chk(v: org.apache.spark.sql.catalyst.expressions.Expression,
            i: org.apache.spark.sql.catalyst.expressions.Expression) =
      functions.TopKAgg(v, i, 3).checkInputDataTypes()
    assert(chk(Literal(0.0), Literal(0L)).isSuccess)
    assert(!chk(Literal.default(StringType), Literal(0L)).isSuccess)
    assert(!chk(Literal.default(IntegerType), Literal(0L)).isSuccess)
    assert(!chk(Literal(0.0), Literal.default(IntegerType)).isSuccess)
    assert(!chk(Literal.default(DoubleType), Literal.default(StringType)).isSuccess)
    assert(chk(Literal.default(DoubleType), Literal.default(LongType)).isSuccess)
  }

  test("graft_nfc / graft_strip_accents match the DuckDB-probed unicode semantics") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    def nfc(s: String): String =
      functions.NfcNormalize(Literal(UTF8String.fromString(s), org.apache.spark.sql.types.StringType))
        .eval(null).toString
    def strip(s: String): String =
      functions.StripAccents(Literal(UTF8String.fromString(s), org.apache.spark.sql.types.StringType))
        .eval(null).toString
    // fixed expectations, verified against DuckDB strip_accents/nfc_normalize
    assert(strip("café") == "cafe")
    assert(strip("Åström") == "Astrom")
    assert(strip("naïve") == "naive")
    assert(strip("ñ") == "n")
    assert(strip("ß") == "ß")       // sharp s is not an accent
    assert(strip("Ώ") == "Ω")       // Greek tonos is
    assert(strip("ASCII only") == "ASCII only")
    // NFC: combining sequence composes to the precomposed codepoint
    assert(nfc("é") == "é")
    assert(nfc("café") == "café")
    // the dedup-key consequence: byte-different spellings, one key after NFC
    assert(nfc("café") == nfc("café"))
    // and the codegen path produces the same thing as interpreted eval
    import spark.implicits._
    val df = Seq("café", "Åström", "plain").toDF("s")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc", exprs => functions.NfcNormalize(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_strip_accents", exprs => functions.StripAccents(exprs.head), "scala_udf")
    val got = df.selectExpr("graft_nfc(s) AS n", "graft_strip_accents(s) AS f")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("café", "cafe"), ("Åström", "Astrom"), ("plain", "plain")))
  }
}
