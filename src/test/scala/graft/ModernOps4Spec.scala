package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 surfaces, part 4 (q301–q303): dynamic SQL and the two
  * data-selection operators. Each test pins the property that makes
  * the operator worth having, not just output equality.
  */
class ModernOps4Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q301 EXECUTE IMMEDIATE binds values, not SQL text") {
    val got = SparkEntry.queries("q301_execute_immediate")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    Tables.registerAll(spark, dir)
    val literal = spark.sql(
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents WHERE lang = 'en' AND source IS NOT NULL
        |GROUP BY source ORDER BY source""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === literal.toSeq)
    assert(got.nonEmpty)
    // the binding is a VALUE: a quote-bearing parameter must arrive as
    // data (no match), never splice into the statement text (no error)
    spark.sql("DECLARE OR REPLACE VARIABLE graft_t_inj STRING DEFAULT " +
      "\"en' OR '1'='1\"")
    val injected = spark.sql(
      """EXECUTE IMMEDIATE
        |  'SELECT count(*) AS n FROM documents WHERE lang = ?'
        |  USING graft_t_inj""".stripMargin).head().getLong(0)
    assert(injected === 0L, "parameter was spliced as SQL text")
  }

  test("q302 importance scores are the per-bucket ratio sums") {
    val rows = SparkEntry.queries("q302_dsir_importance")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 50)
    // descending by (importance, then ascending doc_id on ties)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
    case _ => ()
    }
    // a doc's importance per token is bounded by the max possible
    // ratio (tgt+1)*1e6/(raw+1) <= 1e6, and every token contributes
    // at least ratio >= 1e6/(raw_total+1) > 0
    rows.foreach { case (_, imp, n) =>
      assert(imp > 0 && imp <= n * 1000000L)
    }
    // the target slice IS lang='en', so per-token importance (the
    // bucket-ratio mean) must be higher for en docs than for the rest —
    // at sf0.001 the top-k covers the whole 50-doc corpus, so rank
    // dominance is vacuous but the score separation is not
    Tables.registerAll(spark, dir)
    val lang = spark.sql("SELECT doc_id, lang FROM documents")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def meanPerTok(p: ((Long, Long, Long)) => Boolean) = {
      val sel = rows.filter(p)
      sel.map(r => r._2.toDouble / r._3).sum / sel.length
    }
    val en = meanPerTok(r => lang(r._1) == "en")
    val rest = meanPerTok(r => lang(r._1) != "en")
    assert(en > rest,
      s"target-slice docs must out-score the rest per token ($en <= $rest)")
  }

  test("q303 classifier inference is broadcast + hash-agg, no UDF") {
    val df = SparkEntry.queries("q303_quality_classifier")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop") === false)
    assert(plan.contains("BroadcastHashJoin"),
      "vocabulary weights must broadcast-join back to occurrences:\n" + plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      "inference hot path must stay codegen")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // recompute one doc's score in plain Scala from first principles
    val doc = Tables.load(spark, dir, "documents")
      .filter(col("doc_id") === rows.head.getLong(0))
      .select("text").head().getString(0)
    val expected = doc.split(" ").filter(_.nonEmpty).map { w =>
      var acc = 53L
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        acc = (acc * 41 + cp) % 2147483647L
        i += Character.charCount(cp)
      }
      val b = acc % 1024
      (b * 2654435761L) % 2003 - 1001
    }.sum
    assert(rows.head.getLong(1) === expected,
      "doc score must equal the hand-rolled hashed-linear sum")
    assert(rows.head.getBoolean(3) === (expected > 0))
  }
}
