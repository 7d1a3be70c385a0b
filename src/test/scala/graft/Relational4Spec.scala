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

  test("q238 explode_outer keeps empty-array docs as NULL rows") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, dir, "documents")
      .filter(col("doc_id") < 20)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty)))
    val expected = docs.flatMap { case (id, ws) =>
      if (ws.isEmpty) Seq((id, null: String)) else ws.toSeq.map(w => (id, w))
    }.toSeq
    val got = SparkEntry.queries("q238_explode_outer")(spark, dir)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1))).toSeq
    // multiset equality (row order is the query's concern, not this spec's)
    assert(got.groupBy(identity).view.mapValues(_.size).toMap ===
      expected.groupBy(identity).view.mapValues(_.size).toMap)
    // The outer path itself: a synthetic empty array must yield one NULL row.
    import spark.implicits._
    val syn = Seq((1L, Array[String]()), (2L, Array("a")))
      .toDF("doc_id", "ws")
      .select(col("doc_id"), explode_outer(col("ws")).as("word"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1))).toSet
    assert(syn === Set((1L, null), (2L, "a")))
  }

  test("q239 equals java.util.regex digit-run extraction") {
    val rows = Tables.load(spark, dir, "events")
      .filter(org.apache.spark.sql.functions.col("event_id") < 500)
      .select("event_id", "props").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val pat = java.util.regex.Pattern.compile("[0-9]+")
    val expected = rows.map { case (id, s) =>
      val m = pat.matcher(if (s == null) "" else s)
      val xs = Iterator.continually(m).takeWhile(_.find()).map(_.group()).toSeq
      (id, (xs.size.toLong, xs.mkString(",")))
    }.toMap
    val got = SparkEntry.queries("q239_regexp_extract_all")(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getString(2)))).toMap
    assert(got === expected)
    // digits must actually occur or the extraction path went untested
    assert(expected.values.exists(_._1 > 0), "no digit runs in fixture")
  }

  test("q240 cogroup equals a sequential merged-stream fold") {
    val evs = Tables.load(spark, dir, "events")
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS us", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .filter(e => e._4 == "view" || e._4 == "purchase")
    val expected = evs.groupBy(_._1).map { case (u, g) =>
      val seq = g.sortBy(e => (e._3, e._2)).map(_._4)
      val switches = seq.sliding(2).count {
        case Array(a, b) => a != b
        case _ => false
      }.toLong
      (u, (seq.count(_ == "view").toLong,
        seq.count(_ == "purchase").toLong, switches))
    }
    val got = SparkEntry.queries("q240_cogroup_alternations")(spark, dir)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
    // both event kinds and at least one switch must exist
    assert(got.values.exists(_._3 > 0), "no alternation in fixture")
  }
}
