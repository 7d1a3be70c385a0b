package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q325 bitmap set ops, q326 LOO target encoding, q327 retrieval eval. */
class ModernOps13Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q325 bitmap counts equal plain distinct-set arithmetic") {
    val got = SparkEntry.queries("q325_bitmap_set_ops")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val sets = Tables.load(spark, dir, "events")
      .filter(col("event_type").isNotNull && col("user_id").isNotNull &&
        col("user_id") >= 0)
      .select("event_type", "user_id").distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
    val types = sets.keys.toSeq.sorted
    assert(got.size === types.size * (types.size - 1) / 2)
    for (t1 <- types; t2 <- types if t1 < t2) {
      val (s1, s2) = (sets(t1), sets(t2))
      val want = (s1.size.toLong, s2.size.toLong, (s1 & s2).size.toLong,
        (s1 | s2).size.toLong)
      assert(got((t1, t2)) === want, s"bitmap arithmetic at ($t1,$t2)")
    }
  }

  test("q326 encoding is leakage-free: own label never contributes") {
    val rows = SparkEntry.queries("q326_target_encoding_loo")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val byCat = rows.groupBy(_._2)
    rows.foreach { case (id, cat, y, num, den) =>
      val mates = byCat(cat).filter(_._1 != id)
      if (mates.nonEmpty && byCat(cat).size > 1) {
        assert(num === mates.map(_._3).sum, s"num at doc $id")
        assert(den === mates.size.toLong, s"den at doc $id")
      } else {
        // singleton category: leave-one-out global prior
        val others = rows.filter(_._1 != id)
        assert(num === others.map(_._3).sum && den === others.size.toLong,
          s"global-prior fallback at doc $id")
      }
    }
  }

  test("q327 metrics: perfect-ranking users score ndcg_bp 10000, rr " +
    "reflects the first relevant position") {
    val rows = SparkEntry.queries("q327_retrieval_eval_ndcg")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (u, rr, dcg, idcg, ndcg) =>
      assert(rr >= 0 && rr <= 10000 && ndcg >= 0 && ndcg <= 10000,
        s"metric range at user $u")
      assert(dcg <= idcg, s"DCG cannot exceed ideal at user $u")
      if (idcg > 0) assert(ndcg === dcg * 10000 / idcg)
      else assert(dcg === 0 && ndcg === 0)
    }
    assert(rows.exists(_._5 > 0), "some user must have a scored ranking")
    // a user whose retrieval order equals the ideal order scores 10000
    assert(rows.exists(r => r._5 === 10000L),
      "fixture should contain at least one perfectly-ranked user")
  }
}
