package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q372 update-mode contract, q373 vocab coverage, q374 blowup audit. */
class ModernOps30Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q372 emits per key exactly once per chunk containing it") {
    val evs = Tables.load(spark, dir, "events")
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
      .select("event_type", "ts").collect()
      .map { r =>
        val ts = r.getTimestamp(1)
        (r.getString(0), ts.getTime * 1000 + ts.getNanos / 1000 % 1000,
          ts.toLocalDateTime.toLocalDate.toEpochDay)
      }
    val (lo, hi) = (evs.map(_._2).min, evs.map(_._2).max)
    def chunk(us: Long): Int =
      if (us <= lo + (hi - lo) / 3) 0
      else if (us <= lo + 2 * ((hi - lo) / 3) + 1) 1 else 2
    val want = evs.groupBy(e => (e._1, e._3)).map { case (k, xs) =>
      k -> (xs.length.toLong, xs.map(e => chunk(e._2)).distinct.length.toLong)
    }
    val got = SparkEntry.queries("q372_stream_update_mode")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got === want)
    // the contract's value: most keys emit FEWER times than the total
    // batch count — deltas, not full state, cross the sink per batch
    assert(got.values.exists(_._2 < 3L) ||
      got.values.forall(_._2 <= 3L))
  }

  test("q373 coverage sizes are the minimal ranks clearing each target") {
    val tf = Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split(" ", -1))
      .filter(_.nonEmpty)
      .groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }
    val ordered = tf.toSeq.sortBy { case (t, f) => (-f, t) }.map(_._2)
    val total = ordered.sum
    val cums = ordered.scanLeft(0L)(_ + _).tail
    val got = SparkEntry.queries("q373_vocab_coverage")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    Seq(5000L, 9000L, 9900L).foreach { bp =>
      val minRank =
        cums.indexWhere(c => c * 10000 >= bp * total).toLong + 1
      assert(got(bp) === ((minRank, total)), s"at $bp")
      // minimality: the rank below must NOT clear the target
      if (minRank > 1)
        assert(cums(minRank.toInt - 2) * 10000 < bp * total)
    }
    // coverage thresholds are nested
    assert(got(5000L)._1 <= got(9000L)._1 && got(9000L)._1 <= got(9900L)._1)
  }

  test("q374 predicts the exact materialized join size") {
    val r = SparkEntry.queries("q374_join_blowup_audit")(spark, dir)
      .head()
    // materialize the audited join for real and count
    val a = Tables.load(spark, dir, "orders")
      .filter(col("o_custkey").isNotNull)
      .select(expr("o_custkey % 100").as("ka"))
    val b = Tables.load(spark, dir, "customer")
      .filter(col("c_nationkey").isNotNull)
      .select(expr("c_nationkey % 100").as("kb"))
    val actual = a.join(b, col("ka") === col("kb")).count()
    assert(r.getLong(0) === actual,
      "the audit must equal the real join cardinality, not estimate it")
    assert(r.getLong(1) >= 1 && r.getLong(2) >= 1)
    assert(r.getLong(4) >= 1)
  }
}
