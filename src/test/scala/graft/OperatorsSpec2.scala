package graft

import graft.operators.KMeansLite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec2 extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("KMeansLite recovers well-separated clusters and is deterministic") {
    // 3 tight clusters around (0,0), (10,0), (0,10).
    val pts = (0 until 30).map { i =>
      val c = i % 3
      val (cx, cy) = Seq((0.0, 0.0), (10.0, 0.0), (0.0, 10.0))(c)
      (i.toLong, Array(cx + (i / 3) * 0.01, cy + (i / 3) * 0.02))
    }
    val df = pts.toDF("vec_id", "v")
    val cents = KMeansLite.fit(df, "vec_id", "v", k = 3, iters = 5)
    val assigned = KMeansLite.assign(df, "v", cents)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // Every point lands with its own cluster's members.
    (0 until 30).foreach { i =>
      assert(assigned(i.toLong) == assigned((i % 3).toLong),
        s"point $i split from its cluster seed")
    }
    assert(assigned.values.toSet.size == 3)
    // Deterministic: a second fit yields identical centroids.
    val cents2 = KMeansLite.fit(df, "vec_id", "v", k = 3, iters = 5)
    assert(cents.map(_.toSeq).toSeq == cents2.map(_.toSeq).toSeq)
  }

  test("q115 IVF probe finds the true nearest neighbor for clustered data") {
    // With separable cells, in-cell top-1 == exact top-1 for most queries.
    val q = SparkEntry.queries("q115_ivf_kmeans")
    val out = q(spark, "/root/testdata/sf0.001")
    assert(out.count() > 0)
    val cols = out.columns.toSeq
    assert(cols == Seq("qid", "nid", "cos_sim", "rnk"))
  }

  test("q126 multi-probe IVF never finds a worse best-neighbor than single-probe q115") {
    val dir = "/root/testdata/sf0.001"
    def best(q: String): Map[Long, Double] =
      SparkEntry.queries(q)(spark, dir).filter("rnk = 1").collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val single = best("q115_ivf_kmeans")
    val multi = best("q126_ivf_multiprobe")
    // The multi-probe candidate set is a superset per query, so its top
    // cosine can only match or improve.
    assert(single.keySet.subsetOf(multi.keySet))
    single.foreach { case (qid, c) =>
      assert(multi(qid) >= c, s"query $qid: multi-probe best ${multi(qid)} < $c")
    }
  }

  test("q121 native TABLESAMPLE: ~10% rate and REPEATABLE(42) run-to-run stability") {
    val dir = "/root/testdata/sf0.01"
    // The oracle-facing query asserts its own properties; all three
    // booleans must come back true on real data.
    val props = SparkEntry.queries("q121_tablesample")(spark, dir).collect()
    assert(props.length == 1 && (0 to 2).forall(props(0).getBoolean),
      s"q121 property row not all-true: ${props.mkString}")
    // REPEATABLE(42) stability + tight rate bounds on the raw sample.
    graft.Tables.registerAll(spark, dir)
    val rawSql =
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |TABLESAMPLE (10 PERCENT) REPEATABLE (42)""".stripMargin
    val total = graft.Tables.load(spark, dir, "lineitem").count().toDouble
    val first = spark.sql(rawSql).collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    // Bernoulli 10% at sf0.01 (~60k rows): [8%, 12%] is > 6 sigma.
    assert(first.size / total > 0.08 && first.size / total < 0.12,
      s"sample rate ${first.size / total} outside [0.08, 0.12]")
    val second = spark.sql(rawSql).collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(first == second, "REPEATABLE(42) sample differed between runs")
  }
}
