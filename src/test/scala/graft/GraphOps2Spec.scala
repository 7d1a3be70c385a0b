package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-8 traversal operators (q242 k-hop BFS, q243 k-core peel):
  * independent plain-Scala replays at sf0.001 so the unrolled-CTE
  * DuckDB oracles aren't the only line of defense. */
class GraphOps2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  /** Sequential rebuild of the canonical capped co-supply edges (same
    * contract as GraphOpsSpec). */
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

  test("q242 equals a sequential 3-hop BFS from the mod-50 seeds") {
    val seeds = adj.keySet.filter(_ % 50 == 0)
    var dist: Map[Long, Int] = seeds.map(_ -> 0).toMap
    var frontier = seeds
    for (h <- 1 to 3) {
      frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- dist.keySet
      dist ++= frontier.map(_ -> h)
    }
    val expected = dist.groupBy(_._2).map { case (d, m) =>
      d -> (m.size.toLong, m.keys.sum)
    }
    val got = SparkEntry.queries("q242_khop_reachability")(spark, dir)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expected)
  }

  test("q243 equals a sequential 3-round degree-3 peel") {
    var e = edges
    var surv = Set.empty[Long]
    for (_ <- 1 to 3) {
      val deg = e.toSeq.flatMap { case (u, v) => Seq(u, v) }
        .groupBy(identity).map { case (n, g) => n -> g.size }
      surv = deg.filter(_._2 >= 3).keySet
      e = e.filter { case (u, v) => surv(u) && surv(v) }
    }
    val r = SparkEntry.queries("q243_kcore_peel")(spark, dir).head()
    assert(r.getAs[Long]("n_nodes") === surv.size.toLong)
    assert(r.getAs[Long]("n_edges") === e.size.toLong)
    assert(r.getAs[Long]("sum_node") === surv.sum)
  }

}
