package graft

import org.scalatest.funsuite.AnyFunSuite

/** q223 product quantization: structural invariants plus an independent
  * recomputation of per-vector quantization error against the fitted
  * codebooks. */
class VectorOps2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def l2sq(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }

  test("q223 codes decompose into subspace cells and qerr matches the codebooks") {
    val rows = SparkEntry.queries("q223_product_quantization")(spark, dir)
      .collect().map(r => (r.getLong(0),
        Array(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)),
        r.getLong(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    // code is the base-4 digit assembly of the 4 subspace cells
    rows.foreach { case (_, cs, code, qerr) =>
      assert(cs.forall(c => c >= 0 && c < 4))
      assert(code === ((cs(0) * 4 + cs(1)) * 4 + cs(2)) * 4 + cs(3))
      assert(qerr >= 0.0)
    }
    // Independent error recompute: fit the same deterministic codebooks,
    // then per vector check (a) the assigned cell IS the argmin cell and
    // (b) qerr equals the sum of subspace distances to those centroids.
    val vecs = Tables.load(spark, dir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap
    val books = (0 until 4).map { m =>
      val sub = Tables.load(spark, dir, "embeddings")
        .selectExpr("vec_id",
          s"slice(transform(embedding, x -> CAST(x AS DOUBLE)), ${m * 16 + 1}, 16) AS sv")
      operators.KMeansLite.fit(sub, "vec_id", "sv", k = 4, iters = 2)
    }
    rows.foreach { case (id, cs, _, qerr) =>
      var expectedErr = 0.0
      for (m <- 0 until 4) {
        val sv = vecs(id).slice(m * 16, m * 16 + 16)
        val dists = books(m).map(l2sq(sv, _))
        val argmin = dists.indices.minBy(i => (dists(i), i))
        assert(cs(m) === argmin.toLong, s"vec $id sub $m")
        expectedErr += dists(argmin)
      }
      assert(math.abs(qerr - expectedErr) <= 1e-9 * (1.0 + expectedErr),
        s"vec $id qerr $qerr vs $expectedErr")
    }
  }

  test("q223 fitted codebooks reduce mean qerr vs the init centroids") {
    val sub0 = Tables.load(spark, dir, "embeddings")
      .selectExpr("vec_id",
        "slice(transform(embedding, x -> CAST(x AS DOUBLE)), 1, 16) AS sv")
    val data = sub0.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    val init = data.take(4).map(_._2)
    val fitted = operators.KMeansLite.fit(sub0, "vec_id", "sv", 4, 2)
    def meanErr(books: Array[Array[Double]]): Double =
      data.map { case (_, v) => books.map(l2sq(v, _)).min }.sum / data.length
    assert(meanErr(fitted) <= meanErr(init),
      "2 k-means iterations did not reduce quantization error")
  }
  test("q402 OPQ allocation: 4 disjoint 16-dim groups, top energies spread") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q402_opq_balanced_pq")(spark, dir)
    val rows = df.collect()
    assert(rows.length > 0)
    // codes well-formed: c_m in [0, 4), code = base-4 packing
    rows.foreach { r =>
      val cs = (1 to 4).map(r.getLong)
      assert(cs.forall(c => c >= 0 && c < 4))
      assert(r.getLong(5) == ((cs(0) * 4 + cs(1)) * 4 + cs(2)) * 4 + cs(3))
      assert(r.getDouble(6) >= 0.0)
    }
    // the snake allocation itself: replicate the energy ranking here and
    // check the four highest-energy dims land in four DIFFERENT groups
    // (the balancing property a contiguous slice does not have)
    val all = graft.Tables.load(spark, dir, "embeddings")
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    def qx(j: Int) =
      s"CAST(round(least(greatest(element_at(v, $j), -2048.0), 2048.0) " +
        "* 1024.0) AS BIGINT)"
    val eRow = all.agg(
      sum(expr(s"(${qx(1)}) * (${qx(1)})")).as("e1"),
      (2 to 64).map(j => sum(expr(s"(${qx(j)}) * (${qx(j)})")).as(s"e$j")): _*)
      .first()
    val energies = (0 until 64).map(eRow.getLong)
    val ranked = (1 to 64).sortBy(j => (-energies(j - 1), j))
    val group = ranked.zipWithIndex.map { case (dim, r0) =>
      dim -> (if ((r0 / 4) % 2 == 0) r0 % 4 else 3 - (r0 % 4))
    }.toMap
    assert(group.values.groupBy(identity).forall(_._2.size == 16),
      "groups must have exactly 16 dims each")
    assert(ranked.take(4).map(group).toSet.size == 4,
      "the 4 highest-energy dims must spread across all 4 subspaces")
    // snake second pass reverses: ranks 4..7 also cover all groups
    assert(ranked.slice(4, 8).map(group).toSet.size == 4)
  }

  test("q407 IVFPQ: results come only from the query's probed cells") {
    val rows = SparkEntry.queries("q407_ivfpq_search")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(rows.nonEmpty)
    // exactly top-3 per query, ranks 1..3
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      assert(rs.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L), s"query $qid")
    }
    // independent replay of the routing: refit the coarse quantizer,
    // recompute each query's 2 nearest cells, and check every returned
    // neighbor lives in one of them (the cell-pruned-scan property)
    val all = Tables.load(spark, dir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
    val cents = operators.KMeansLite.fit(all, "vec_id", "v", k = 8, iters = 3)
    val vecs = all.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap
    def cellOf(v: Array[Double]): Int =
      cents.indices.minBy(i => (l2sq(v, cents(i)), i))
    def probesOf(v: Array[Double]): Set[Int] =
      cents.indices.sortBy(i => (l2sq(v, cents(i)), i)).take(2).toSet
    rows.foreach { case (qid, nid, _) =>
      assert(probesOf(vecs(qid)).contains(cellOf(vecs(nid))),
        s"neighbor $nid of query $qid is outside the probed cells")
    }
  }

}
