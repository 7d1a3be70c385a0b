package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-8 graph operators (q209, q212): independent plain-Scala
  * recomputations at sf0.001 so the DuckDB oracles aren't the only
  * line of defense. */
class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  /** Canonical (u < v) co-supply edges, recomputed sequentially with
    * the same per-part supplier cap (50) the operators declare. */
  private lazy val edges: Set[(Long, Long)] = {
    val ps = Tables.load(spark, dir, "lineitem")
      .select("l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    ps.groupBy(_._1).filter(_._2.length <= 50).values.flatMap { sup =>
      val ss = sup.map(_._2).sorted
      for (i <- ss.indices; j <- (i + 1) until ss.length)
        yield (ss(i), ss(j))
    }.toSet
  }

  private lazy val adj: Map[Long, Set[Long]] = {
    val bi = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
    bi.groupBy(_._1).map { case (n, g) => n -> g.map(_._2).toSet }
  }

  test("q209 counts exactly the brute-force triangles of the capped graph") {
    val nodes = adj.keys.toSeq.sorted
    var tri = 0L
    for ((u, v) <- edges; w <- adj(u) if w > v && adj(v).contains(w))
      tri += 1
    val r = SparkEntry.queries("q209_triangle_count")(spark, dir).head()
    assert(r.getAs[Long]("n_vertices") === nodes.length.toLong)
    assert(r.getAs[Long]("n_edges") === edges.size.toLong)
    assert(r.getAs[Long]("n_triangles") === tri)
    assert(r.getAs[Long]("max_degree") === adj.values.map(_.size).max.toLong)
    assert(r.getAs[Long]("sum_degree") === 2L * edges.size)
  }

  test("q212 equals a sequential 3-superstep LPA replay (count desc, min label)") {
    var labels: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      labels = adj.map { case (n, nbrs) =>
        val freq = nbrs.toSeq.map(labels).groupBy(identity)
          .map { case (l, g) => (l, g.size) }
        // max by (count, -label): count desc then label asc
        val best = freq.toSeq.minBy { case (l, c) => (-c, l) }._1
        n -> best
      }
    }
    val expected = labels.values.groupBy(identity)
      .map { case (l, g) => (l, g.size.toLong) }
    val got = SparkEntry.queries("q212_label_propagation")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === expected)
  }

  test("q212 output is totally ordered by (n_members desc, community)") {
    val rows = SparkEntry.queries("q212_label_propagation")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(0)))
    val sorted = rows.sortBy { case (n, c) => (-n, c) }
    assert(rows.toSeq === sorted.toSeq)
  }
}
