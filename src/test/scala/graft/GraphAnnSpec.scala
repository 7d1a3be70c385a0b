package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q427 graph ANN (cluster-seeded bounded-degree graph + beam search):
  *  - recall@3 on the q233 eval set must be >= the single-cell IVF
  *    probe's recall with the SAME k-means cells (beam search crosses
  *    cells through hub entry points; IVF cannot leave its cell);
  *  - the plan is cartesian-free (the only cross join is the bounded
  *    hub entry-point set, broadcast like centroids);
  *  - the graph is bounded-degree (<= GD out-edges per node).
  */
class GraphAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf

  private def hits(result: Map[Long, Seq[Long]],
      truth: Map[Long, Seq[Long]]): Int =
    truth.map { case (q, t) =>
      t.count(result.getOrElse(q, Nil).contains)
    }.sum

  test("beam-search recall@3 >= single-cell IVF recall@3, same cells") {
    import org.apache.spark.sql.expressions.Window
    val graph = SparkEntry.queries("q427_graph_ann_beam")(spark, dir)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSeq }
    // exact ground truth + IVF probe over the same corpus and cells
    val all = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    graft.functions.GraftFunctions.register(spark)
    val withN = all.withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
    val cents = graft.operators.KMeansLite.fit(withN, "vec_id", "v", 8, 3)
    val cells = graft.operators.KMeansLite.assign(withN, "v", cents)
    val q = cells.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("cell").as("qcell"),
        col("v").as("qv"), col("nrm").as("qnrm"))
    val w = Window.partitionBy("qid").orderBy(col("cs").desc, col("vec_id"))
    def top3(joined: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      joined.withColumn("cs",
          expr("graft_dot(qv, v)") / (col("qnrm") * col("nrm")))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select("qid", "vec_id").collect().groupBy(_.getLong(0))
        .map { case (k, rs) => k -> rs.map(_.getLong(1)).toSeq }
    val exact = top3(cells.join(broadcast(q), col("vec_id") =!= col("qid")))
    val ivf = top3(cells.join(q,
      col("cell") === col("qcell") && col("vec_id") =!= col("qid")))
    val graphHits = hits(graph, exact)
    val ivfHits = hits(ivf, exact)
    assert(graphHits >= ivfHits,
      s"graph ANN recall regressed below IVF: $graphHits < $ivfHits hits " +
        s"of ${exact.size * 3}")
    // and it actually finds most of the truth (sanity floor)
    assert(graphHits * 2 >= exact.size * 3,
      s"graph ANN recall under 50%: $graphHits of ${exact.size * 3}")
  }

  test("plan is cartesian-free; graph degree bounded") {
    val df = SparkEntry.queries("q427_graph_ann_beam")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      "graph ANN fused a cartesian:\n" + p)
    // every query returns at most 3 neighbors, no self-matches
    val rows = df.collect()
    assert(rows.groupBy(_.getLong(0)).values.forall(_.length <= 3))
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
  }
}
