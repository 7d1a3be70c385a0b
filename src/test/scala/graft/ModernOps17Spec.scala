package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q338 long-tail collapse, q339 weighted median, q340 exact AUC,
  * q341 Gini. */
class ModernOps17Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def tokens() = Tables.load(spark, dir, "documents")
    .filter(col("doc_id").isNotNull && col("text").isNotNull)
    .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    .filter(col("w") =!= "")
    .collect().map(r => (r.getLong(0), r.getString(1)))

  test("q338 keeps exactly the top-8 and conserves occurrence mass") {
    val rows = SparkEntry.queries("q338_longtail_collapse")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val toks = tokens()
    val freq = toks.groupBy(_._2).map { case (w, xs) => w -> xs.size }
    val top = freq.toSeq.sortBy { case (w, f) => (-f, w) }.take(8)
      .map(_._1).toSet
    assert(rows.map(_._1).toSet === top + "__other__")
    assert(rows.map(_._2).sum === toks.length.toLong,
      "occurrence mass must be conserved")
    val other = rows.find(_._1 == "__other__").get
    assert(other._4 === (freq.keySet -- top).size.toLong,
      "collapsed source-category count")
    rows.filter(_._1 != "__other__").foreach { r =>
      assert(r._4 === 1L && r._2 === freq(r._1).toLong)
    }
  }

  test("q339 weighted median: half the weight sits at or below it") {
    val rows = SparkEntry.queries("q339_weighted_median")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val data = Tables.load(spark, dir, "lineitem")
      .filter(col("l_returnflag").isNotNull &&
        col("l_extendedprice").isNotNull &&
        col("l_quantity").isNotNull && col("l_quantity") >= 1)
      .select(col("l_returnflag"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)"),
        expr("CAST(floor(l_quantity) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { case (flag, totW, med, p90) =>
      val xs = data(flag)
      assert(totW === xs.map(_._3).sum)
      def cumAt(v: Long) = xs.filter(_._2 <= v).map(_._3).sum
      assert(cumAt(med) * 2 >= totW && cumAt(med - 1) * 2 < totW,
        s"median property at $flag")
      assert(cumAt(p90) * 10 >= totW * 9 && cumAt(p90 - 1) * 10 < totW * 9,
        s"p90 property at $flag")
    }
  }

  test("q340 AUC equals the pair-counting definition with half-ties") {
    val rows = SparkEntry.queries("q340_exact_auc")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = rows.find(_._1 == "TOTAL").get
    val docs = Tables.load(spark, dir, "documents")
      .filter(col("doc_id").isNotNull && col("source").isNotNull &&
        col("lang").isNotNull && col("n_chars").isNotNull)
      .select(col("n_chars"), (col("lang") === "en").cast("int"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val pos = docs.filter(_._2 == 1).map(_._1)
    val neg = docs.filter(_._2 == 0).map(_._1)
    assert(total._2 === pos.length.toLong && total._3 === neg.length.toLong)
    // AUC = (#(pos>neg) + #(pos==neg)/2) / (npos*nneg), doubled to
    // stay integral
    val wins2 = (for (p <- pos; n <- neg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    assert(total._4 === wins2 * 10000 / (2L * pos.length * neg.length),
      "AUC differs from the pair-counting definition")
    assert(rows.length > 1, "per-source scopes must be present")
  }

  test("q341 Gini matches the mean-absolute-difference definition") {
    val r = SparkEntry.queries("q341_gini_concentration")(spark, dir)
      .head()
    val (n, tot, gini) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val xs = Tables.load(spark, dir, "orders")
      .filter(col("o_custkey").isNotNull && col("o_totalprice").isNotNull)
      .groupBy("o_custkey")
      .agg(sum(expr(
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .as("c"))
      .collect().map(_.getLong(1))
    assert(n === xs.length.toLong && tot === xs.sum)
    // G = sum_{i,j} |x_i - x_j| / (2 n^2 mu) = sum|diff| / (2 n tot)
    val sumAbs = (for (a <- xs; b <- xs) yield math.abs(a - b)).sum
    assert(gini === sumAbs * 10000 / (2L * xs.length * xs.sum),
      "Gini differs from mean-absolute-difference form")
    assert(gini > 0 && gini < 10000)
  }
}
