package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q315 curation pipeline v2: pins the stage contracts — dedup
  * winners only, gate respected, per-doc classifier scores identical
  * to the standalone q303 operator (same model, same tokens → same
  * number), and the final ordering. */
class ModernOps9Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q315 output respects dedup, gate, ranking, and q303 agreement") {
    val rows = SparkEntry.queries("q315_curation_e2e_v2")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // gate: every selected doc scored positive
    assert(rows.forall(_._2 > 0))
    // ranking: importance DESC, doc_id ASC on ties
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._3 > b._3 || (a._3 == b._3 && a._1 < b._1))
      case _ => ()
    }
    // dedup: every selected doc is the min doc_id for its text
    val winners = Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .groupBy("text").agg(min("doc_id").as("w"))
      .select("w").collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => winners.contains(r._1)),
      "every selected doc must be its text's dedup winner")
    // model consistency: q315's per-doc score equals standalone q303
    // (the classifier is per-doc — dedup cannot change a winner's own
    // score)
    val q303 = SparkEntry.queries("q303_quality_classifier")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { case (id, score, _, nToks) =>
      assert(q303(id) === ((score, nToks)),
        s"doc $id: pipeline score/toks must equal the standalone operator")
    }
  }
}
