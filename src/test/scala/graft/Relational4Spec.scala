package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-8 dialect surfaces (q218/q219) + chunk dedup (q220): each
  * sugar form must equal its explicit spelling; q220 gets a sequential
  * replay. */
class Relational4Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q218 GROUP BY ALL / ORDER BY ALL equals the explicit spelling") {
    val got = SparkEntry.queries("q218_group_order_all")(spark, dir).collect()
    Tables.registerAll(spark, dir)
    val explicit = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus, n_items, sum_qty
        |LIMIT 4 OFFSET 2""".stripMargin).collect()
    assert(got.toSeq === explicit.toSeq)
  }

  test("q219 lateral aliases equal the fully-expanded projection") {
    val got = SparkEntry.queries("q219_lateral_alias")(spark, dir).collect()
    Tables.registerAll(spark, dir)
    val explicit = spark.sql(
      """SELECT o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS STRING) AS p,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 2 AS STRING) AS p2,
        |  CASE WHEN CAST(o_totalprice AS DECIMAL(12,2)) * 2 > 300000
        |       THEN 'big' ELSE 'small' END AS sz
        |FROM orders WHERE o_orderkey <= 100
        |ORDER BY o_orderkey""".stripMargin).collect()
    assert(got.toSeq === explicit.toSeq)
  }

  test("q220 equals a sequential first-writer-wins chunk replay") {
    val W = 20
    val toks = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty)))
      .filter(_._2.nonEmpty).sortBy(_._1)
    val chunks = toks.flatMap { case (id, ws) =>
      ws.grouped(W).zipWithIndex.map { case (c, i) =>
        (id, i.toLong, c.mkString(" "))
      }
    }
    val seen = scala.collection.mutable.Set[String]()
    val dup = chunks.sortBy(c => (c._1, c._2)).map { case (id, _, c) =>
      val isDup = seen.contains(c); seen += c; (id, isDup)
    }
    val expected = dup.groupBy(_._1).map { case (id, g) =>
      val n = g.length.toLong; val d = g.count(_._2).toLong
      id -> (n, d, (n - d) * 10000 / n)
    }
    val got = SparkEntry.queries("q220_chunk_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === expected)
  }
}
