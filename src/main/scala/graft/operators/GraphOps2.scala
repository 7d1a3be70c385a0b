package graft.operators

import graft.Q
import org.apache.spark.sql.functions._

/** Round-8 graph traversal operators over the co-supply graph (shared
  * edge projection — [[GraphOps.edges]] / [[GraphOps.edgeCte]]).
  *
  * Scale design:
  *  - q242 k-hop BFS is the standard synchronous frontier expansion:
  *    each hop is one equi-join of the (small) frontier against the
  *    bi-directed adjacency on the source key plus one anti-join
  *    against the visited set — both shuffle-partitioned on node id.
  *    State is one (node, dist) row per reached vertex: linear in the
  *    vertex count, never in edges x hops. The hop count is fixed (3),
  *    so the oracle unrolls the same three frontier steps as nested
  *    CTEs — no recursion, bit-identical semantics.
  *  - q243 k-core peeling runs a fixed 3 rounds of the classic
  *    degree-prune loop (drop vertices with degree < k, drop edges
  *    touching a dropped vertex, repeat). Each round is one degree
  *    aggregation plus two semi-joins — all map-side-combinable,
  *    all keyed on node id. Fixing the round count makes the result
  *    deterministic and SQL-expressible (true cores need a fixpoint,
  *    which neither a hash-checked oracle nor a bounded plan wants);
  *    3 rounds converge on this graph family and the unrolled oracle
  *    proves it.
  *  - Both queries `localCheckpoint` the iterated state: 3 rounds of
  *    join lineage otherwise re-execute the edge projection per
  *    consumer and defeat AQE stats. On a cluster this is persist().
  */
object GraphOps2 {

  /** Seed predicate for the BFS: every 50th supplier id. */
  private val SeedMod = 50

  /** BFS hop budget (fixed; the oracle unrolls exactly this many). */
  private val Hops = 3

  private val q242 = Q(
    "q242_khop_reachability",
    s"""WITH ${GraphOps.edgeCte},
       |bi AS MATERIALIZED (
       |  SELECT u AS a, v AS b FROM e UNION ALL SELECT v AS a, u AS b FROM e),
       |verts AS MATERIALIZED (SELECT DISTINCT a AS node FROM bi),
       |h0 AS MATERIALIZED (SELECT node FROM verts WHERE node % $SeedMod = 0),
       |h1 AS MATERIALIZED (SELECT DISTINCT bi.b AS node FROM bi JOIN h0 ON h0.node = bi.a
       |       WHERE bi.b NOT IN (SELECT node FROM h0)),
       |h2 AS MATERIALIZED (SELECT DISTINCT bi.b AS node FROM bi JOIN h1 ON h1.node = bi.a
       |       WHERE bi.b NOT IN (SELECT node FROM h0)
       |         AND bi.b NOT IN (SELECT node FROM h1)),
       |h3 AS MATERIALIZED (SELECT DISTINCT bi.b AS node FROM bi JOIN h2 ON h2.node = bi.a
       |       WHERE bi.b NOT IN (SELECT node FROM h0)
       |         AND bi.b NOT IN (SELECT node FROM h1)
       |         AND bi.b NOT IN (SELECT node FROM h2)),
       |lev AS (SELECT 0 AS dist, node FROM h0
       |  UNION ALL SELECT 1, node FROM h1
       |  UNION ALL SELECT 2, node FROM h2
       |  UNION ALL SELECT 3, node FROM h3)
       |SELECT dist, CAST(count(*) AS BIGINT) AS n_nodes,
       |  CAST(sum(node) AS BIGINT) AS sum_node
       |FROM lev GROUP BY dist ORDER BY dist""".stripMargin) { (s, dir) =>
    val e = GraphOps.edges(s, dir)
    val bi = e.select(col("u").as("a"), col("v").as("b"))
      .union(e.select(col("v").as("a"), col("u").as("b")))
      .localCheckpoint()
    val seeds = bi.select(col("a").as("node")).distinct()
      .filter(col("node") % SeedMod === 0)
    // Only the frontier is cut per hop (it feeds both the next
    // expansion and the visited union); checkpointing visited too
    // added a full materialization job per hop for a vertex-bounded
    // table whose lineage is already shallow (union of cut frontiers).
    var visited = seeds.withColumn("dist", lit(0))
    var frontier = seeds
    for (h <- 1 to Hops) {
      frontier = bi
        .join(frontier.withColumnRenamed("node", "a"), "a")
        .select(col("b").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .localCheckpoint()
      visited = visited.union(frontier.withColumn("dist", lit(h)))
    }
    visited.groupBy("dist")
      .agg(count(lit(1)).as("n_nodes"), sum("node").as("sum_node"))
      .orderBy("dist")
  }

  /** Core order and fixed peel rounds for q243. */
  private val CoreK = 3
  private val PeelRounds = 3

  private val q243 = Q(
    "q243_kcore_peel",
    s"""WITH ${GraphOps.edgeCte},
       |d1 AS MATERIALIZED (SELECT s FROM (SELECT u AS s FROM e UNION ALL SELECT v AS s FROM e)
       |       GROUP BY s HAVING count(*) >= $CoreK),
       |e1 AS MATERIALIZED (SELECT u, v FROM e
       |       WHERE u IN (SELECT s FROM d1) AND v IN (SELECT s FROM d1)),
       |d2 AS MATERIALIZED (SELECT s FROM (SELECT u AS s FROM e1 UNION ALL SELECT v AS s FROM e1)
       |       GROUP BY s HAVING count(*) >= $CoreK),
       |e2 AS MATERIALIZED (SELECT u, v FROM e1
       |       WHERE u IN (SELECT s FROM d2) AND v IN (SELECT s FROM d2)),
       |d3 AS MATERIALIZED (SELECT s FROM (SELECT u AS s FROM e2 UNION ALL SELECT v AS s FROM e2)
       |       GROUP BY s HAVING count(*) >= $CoreK),
       |e3 AS MATERIALIZED (SELECT u, v FROM e2
       |       WHERE u IN (SELECT s FROM d3) AND v IN (SELECT s FROM d3))
       |SELECT CAST((SELECT count(*) FROM d3) AS BIGINT) AS n_nodes,
       |  CAST((SELECT count(*) FROM e3) AS BIGINT) AS n_edges,
       |  CAST((SELECT coalesce(sum(s), 0) FROM d3) AS BIGINT) AS sum_node""".stripMargin) {
    (s, dir) =>
    var e = GraphOps.edges(s, dir).localCheckpoint()
    var surv = e.sparkSession.emptyDataFrame
    for (_ <- 1 to PeelRounds) {
      surv = e.select(col("u").as("s")).union(e.select(col("v").as("s")))
        .groupBy("s").agg(count(lit(1)).as("d"))
        .filter(col("d") >= CoreK).select("s")
        .localCheckpoint()
      e = e
        .join(surv.withColumnRenamed("s", "u"), Seq("u"), "left_semi")
        .join(surv.withColumnRenamed("s", "v"), Seq("v"), "left_semi")
        .select("u", "v")
        .localCheckpoint()
    }
    val nodes = surv.agg(count(lit(1)).as("n_nodes"),
      coalesce(sum("s"), lit(0L)).as("sum_node"))
    val edgesAgg = e.agg(count(lit(1)).as("n_edges"))
    nodes.crossJoin(edgesAgg).select("n_nodes", "n_edges", "sum_node")
  }

  val defs: Seq[Q] = Seq(q242, q243)
}
