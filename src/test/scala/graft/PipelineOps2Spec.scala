package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-5 pipeline operators, part 2 (q138-q142): independent
  * plain-Scala recomputations at sf0.001 so the DuckDB oracles aren't
  * the only line of defense. */
class PipelineOps2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def vectors(): Array[(Long, Array[Double])] =
    Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  test("q138 dup clusters equal a brute-force union-find over LSH-verified pairs") {
    val vs = vectors()
    // Independent plain-Scala replay of the adaptive-prefix SRP-LSH
    // edge source (srpAllPairEdges): 64 LCG hyperplanes = 4 bands x 16
    // bits, key = first ub bits per band with ub from the corpus-count
    // ladder, candidates = pairs sharing any band key, edges = exact
    // cosine >= tau over candidates.
    def coef(idx: Int): Double = {
      val x = (1103515245L * idx + 12345L) % 2147483648L
      x.toDouble / 2147483648.0 * 2.0 - 1.0
    }
    val planes = Array.tabulate(64, 64)((p, i) => coef(p * 64 + i))
    val ub = (4 to 16).find(b => vs.length <= (64L << b)).getOrElse(16)
    def bandKeys(v: Array[Double]): Array[Int] = {
      val bits = planes.map { pl =>
        var d = 0.0; var i = 0
        while (i < 64) { d += v(i) * pl(i); i += 1 }
        if (d >= 0) 1 else 0
      }
      Array.tabulate(4) { b =>
        (0 until 16).map(j => bits(b * 16 + j) << (15 - j)).sum >> (16 - ub)
      }
    }
    val keys = vs.map { case (id, v) => id -> bandKeys(v) }.toMap
    // bounded-degree sorted-neighborhood candidates (CcNeighborWindow
    // = 8): per (band, key) bucket in vec_id order, each vector pairs
    // with its 8 preceding bucket-mates — independent replay of the
    // operator's candidate rule
    val buckets = scala.collection.mutable.Map
      .empty[(Int, Int), scala.collection.mutable.ArrayBuffer[Long]]
    vs.map(_._1).sorted.foreach { id =>
      keys(id).zipWithIndex.foreach { case (k, b) =>
        buckets.getOrElseUpdate((b, k),
          scala.collection.mutable.ArrayBuffer.empty[Long]) += id
      }
    }
    val vmap = vs.toMap
    val candPairs: Set[(Long, Long)] = buckets.values.flatMap { ids =>
      ids.indices.flatMap(i =>
        (math.max(0, i - 8) until i).map(j => (ids(j), ids(i))))
    }.toSet
    val lshEdges = candPairs.filter { case (a, b) =>
      cos(vmap(a), vmap(b)) >= operators.VectorOps.NearDupTau
    }
    // cross-check vs the exact all-pairs surface: LSH never invents an
    // edge (every candidate is cosine-verified), it can only miss, and
    // at this SF it keeps a non-trivial subset.
    val exactEdges = (for {
      i <- vs.indices; j <- (i + 1) until vs.length
      if cos(vs(i)._2, vs(j)._2) >= operators.VectorOps.NearDupTau
    } yield (vs(i)._1, vs(j)._1)).toSet
    assert(lshEdges.subsetOf(exactEdges), "LSH edge not in exact edge set")
    assert(lshEdges.nonEmpty, "LSH edge set trivially empty at this SF")
    val parent = scala.collection.mutable.Map(vs.map(v => v._1 -> v._1): _*)
    def find(x: Long): Long = { val p = parent(x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    lshEdges.foreach { case (a, b) => union(a, b) }
    val expected = vs.map(v => v._1 -> find(v._1)).toMap
    val sizes = expected.values.groupBy(identity).map { case (c, g) => c -> g.size.toLong }
    val got = SparkEntry.queries("q138_dup_clusters")(spark, dir).collect()
    assert(got.length == vs.length)
    got.foreach { r =>
      val (vid, cl, sz, rep) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))
      assert(cl == expected(vid), s"vec $vid: cluster $cl != ${expected(vid)}")
      assert(sz == sizes(cl), s"cluster $cl size")
      assert(rep == (vid == cl))
    }
    // the graph is non-trivial at this SF: at least one multi-member cluster
    assert(sizes.values.exists(_ > 1), "fixture has no near-dup cluster")
  }

  test("q139 SRP-LSH equals a plain-Scala replay of the bucketed probe") {
    val vs = vectors()
    // same LCG hyperplanes as the operator (independent re-derivation)
    def coef(idx: Int): Double = {
      val x = (1103515245L * idx + 12345L) % 2147483648L
      x.toDouble / 2147483648.0 * 2.0 - 1.0
    }
    val planes = Array.tabulate(16, 64)((p, i) => coef(p * 64 + i))
    def bandKeys(v: Array[Double]): Array[Int] = {
      val bits = planes.map { pl =>
        var d = 0.0; var i = 0
        while (i < 64) { d += v(i) * pl(i); i += 1 }
        if (d >= 0) 1 else 0
      }
      Array.tabulate(4)(b => bits(4 * b) * 8 + bits(4 * b + 1) * 4 + bits(4 * b + 2) * 2 + bits(4 * b + 3))
    }
    val keys = vs.map { case (id, v) => id -> bandKeys(v) }.toMap
    val byId = vs.toMap
    val expected = vs.filter(_._1 < 50).flatMap { case (qid, qv) =>
      val qk = keys(qid)
      val cands = vs.filter { case (nid, _) =>
        nid != qid && keys(nid).zip(qk).exists { case (a, b) => a == b }
      }
      cands.map { case (nid, nv) => (qid, nid, cos(qv, nv)) }
        .sortBy { case (_, nid, c) => (-c, nid) }.take(3).zipWithIndex
        .map { case ((q, n, c), i) => (q, n) -> ((c, i + 1L)) }
    }.toMap
    val got = SparkEntry.queries("q139_srp_lsh_ann")(spark, dir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      val (c, rnk) = expected(k)
      assert(math.abs(r.getDouble(2) - c) < 1e-12, s"$k cos")
      assert(r.getLong(3) == rnk, s"$k rank")
    }
  }

  test("q140 CDC compaction: tombstoned keys absent, survivors at last version") {
    val orders = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = SparkEntry.queries("q140_cdc_compaction")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getDouble(3)))).toMap
    val expectedKeys = orders.keySet.filter(_ % 7 != 0)
    assert(got.keySet == expectedKeys, "survivor key set")
    got.foreach { case (k, (v, st, amt)) =>
      assert(v == k % 3 + 1, s"key $k final version")
      assert(st == s"S${(k + v) % 5}", s"key $k status")
      assert(amt == orders(k) + v, s"key $k amount")
    }
  }

  test("q141 range export invariants hold") {
    val n = Tables.load(spark, dir, "lineitem").count()
    val r = SparkEntry.queries("q141_range_export")(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == n, "rows conserved")
    assert(r(0).getBoolean(3), "2..8 shards")
    assert(r(0).getBoolean(4), "shard ranges ordered")
  }

  test("q143 token windows match a plain-Scala chunker") {
    val texts = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expected = texts.flatMap { case (id, t) =>
      val ws = t.split(' ').filter(_.nonEmpty)
      if (ws.isEmpty) Seq.empty
      else (1 to ws.length by 40).zipWithIndex.map { case (start, wi) =>
        val nIn = math.min(50, ws.length - start + 1)
        (id, wi.toLong) -> ((start.toLong, nIn.toLong, ws(start - 1), ws(start + nIn - 2)))
      }
    }.toMap
    val got = SparkEntry.queries("q143_token_windows")(spark, dir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      assert(expected(k) == ((r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))), s"$k")
    }
  }

  test("q144 domain-mix sample: rates follow sqrt weights, counts match") {
    val rows = SparkEntry.queries("q144_domain_mix_sample")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val sizes = rows.map { case (src, n, _, _) => src -> n }.toMap
    // mirror the engine: 2^20-quantized sqrt weights, exact integer sum,
    // integral division for the basis-point rate (order-independent)
    val qs = sizes.map { case (s2, n) =>
      s2 -> math.floor(math.sqrt(n.toDouble) * 1048576.0).toLong }
    val swq = qs.values.sum
    rows.foreach { case (src, n, bp, sampled) =>
      val expBp = math.min(10000L, (2000000L * qs(src)) / (swq * n))
      assert(bp == expBp, s"$src rate")
      assert(sampled <= n && (bp == 0 || sampled >= 0))
      // the realized rate is within 5pp of target (fingerprints ~uniform)
      if (n >= 50)
        assert(math.abs(sampled.toDouble / n - bp / 10000.0) < 0.05, s"$src realized")
    }
  }

  test("q145 recursive CTE equals an iterative ancestor walk") {
    val keys = Tables.load(spark, dir, "orders")
      .select("o_orderkey").collect().map(_.getLong(0))
      .filter(k => k >= 2 && k < 2000)
    val expected = keys.flatMap { k =>
      Iterator.iterate(k / 2)(_ / 2).takeWhile(_ >= 1).zipWithIndex
        .map { case (p, i) => (k, p, i + 1L) }
    }.toSet
    val got = SparkEntry.queries("q145_recursive_cte")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("q146 incremental dedup equals an exact cross-batch check") {
    val texts = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def sh3(t: String): Set[String] = {
      val ws = t.split(' ')
      if (ws.length < 3) Set.empty
      else ws.sliding(3).map(_.mkString(" ")).toSet
    }
    def key5(t: String): String = t.split(' ').take(5).mkString(" ")
    val existing = texts.filter(_._1 % 5 < 4)
    val incoming = texts.filter(_._1 % 5 == 4)
    val expected = incoming.map { case (id, t) =>
      val exact = existing.filter { case (_, et) => key5(et) == key5(t) }
        .map(_._1).sorted.headOption
      val g = sh3(t)
      val near = existing.filter { case (_, et) =>
        val ge = sh3(et)
        val inter = g.intersect(ge).size
        g.nonEmpty && ge.nonEmpty &&
          inter.toDouble / (g.size + ge.size - inter) >= 0.9
      }.map(_._1).sorted.headOption
      id -> ((exact.orElse(near), if (exact.isDefined) "exact"
              else if (near.isDefined) "near" else null))
    }.toMap
    val got = SparkEntry.queries("q146_incremental_dedup")(spark, dir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val id = r.getLong(0)
      val (src, reason) = expected(id)
      assert(r.getBoolean(1) == src.isDefined, s"doc $id is_dup")
      assert(Option(r.getString(2)).orNull == reason, s"doc $id reason")
      assert((if (r.isNullAt(3)) None else Some(r.getLong(3))) == src, s"doc $id src")
    }
    assert(expected.values.exists(_._1.isDefined), "fixture has no cross-batch dup")
  }

  test("q147 int8 quantization stats match a plain-Scala pass, cosine preserved") {
    val vs = vectors().filter(_._1 < 100)
    val got = SparkEntry.queries("q147_embedding_quantize")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.size == vs.length)
    vs.foreach { case (id, v) =>
      val m = v.map(math.abs).max
      val scale = if (m == 0) 1.0 else m / 127.0
      val dq = v.map(x => math.floor(x / scale + 0.5) * scale)
      val maxErr = v.zip(dq).map { case (a, b) => math.abs(a - b) }.max
      val (s1, e1, c1) = got(id)
      assert(s1 == scale, s"vec $id scale")
      assert(e1 == maxErr, s"vec $id err")
      assert(math.abs(c1 - cos2(v, dq)) < 1e-15 && c1 > 0.99,
        s"vec $id cosine $c1 not preserved")
      assert(maxErr <= scale / 2 + 1e-15, s"vec $id err bound")
    }
  }

  private def cos2(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  test("q142 tf-idf top terms match a plain-Scala recomputation") {
    val texts = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val toks = texts.map { case (id, t) => id -> t.split(' ').filter(_.nonEmpty) }
    val df = toks.flatMap(_._2.distinct).groupBy(identity).map { case (w, g) => w -> g.length }
    val nDocs = texts.length
    val expected = toks.filter(_._1 < 20).flatMap { case (id, ws) =>
      val counts = ws.groupBy(identity).map { case (w, g) => w -> g.length }
      counts.toSeq.map { case (w, c) =>
        (w, c, df(w), (c.toDouble / ws.length) * ((nDocs + 1.0) / (df(w) + 1.0)))
      }.sortBy { case (w, _, _, s) => (-s, w) }.take(5).zipWithIndex
        .map { case ((w, c, d, s), i) => (id, w) -> ((c.toLong, d.toLong, s, i + 1L)) }
    }.toMap
    val got = SparkEntry.queries("q142_tfidf_terms")(spark, dir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val k = (r.getLong(0), r.getString(1))
      val (c, d, s, rnk) = expected(k)
      assert(r.getLong(2) == c && r.getLong(3) == d && r.getLong(5) == rnk, s"$k")
      assert(math.abs(r.getDouble(4) - s) < 1e-12, s"$k score")
    }
  }

  test("q193 snapshot diff equals a plain-Scala map reconciliation") {
    val rows = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice", "o_orderstatus").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val a = rows.map { case (k, p, s2) => k -> ((p, s2)) }.toMap
    val b = (rows.filter(_._1 % 97 != 0).map { case (k, p, s2) =>
        k -> ((if (k % 89 == 0) p + 1.0 else p, s2)) } ++
      rows.filter(_._1 % 101 == 0).map { case (k, p, s2) =>
        (k + 100000000L) -> ((p, s2)) }).toMap
    val classes = (a.keySet ++ b.keySet).toSeq.map { k =>
      val cls = (a.get(k), b.get(k)) match {
        case (None, _) => "added"
        case (_, None) => "removed"
        case (Some(x), Some(y)) => if (x == y) "unchanged" else "changed"
      }
      k -> cls
    }
    val expected = classes.groupBy(_._2).map { case (cls, g) =>
      cls -> ((g.length.toLong, g.map(_._1).min, g.map(_._1).max))
    }
    val got = SparkEntry.queries("q193_snapshot_diff")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    // all four classes must be present for the check to discriminate
    assert(got.keySet == Set("added", "removed", "changed", "unchanged"))
  }
}
