package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q334 IPS policy eval, q335 pseudonymization, q336 NOT IN logic. */
class ModernOps16Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q334 IPS replays exactly and per-action rows decompose TOTAL") {
    val rows = SparkEntry.queries("q334_ips_policy_eval")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val total = rows.find(_._1 == "TOTAL").get
    val per = rows.filter(_._1 != "TOTAL")
    assert(per.map(_._2).sum === total._2, "n_logged decomposition")
    assert(per.map(_._3).sum === total._3, "n_match decomposition")
    assert(per.map(_._4).sum === total._4, "r_match decomposition")
    // replay the estimator on raw events
    val evs = Tables.load(spark, dir, "events")
      .filter(col("user_id").isNotNull && col("event_id").isNotNull &&
        col("event_type").isNotNull && col("value").isNotNull)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.getDouble(3) > 100) 1L else 0L))
    val pol = evs.filter(_._2 % 2 == 0).groupBy(_._1).map { case (u, es) =>
      u -> es.groupBy(_._3).map { case (a, xs) => (a, xs.size) }
        .toSeq.maxBy { case (a, c) => (c, a) }(
          Ordering.Tuple2(Ordering.Int, Ordering.String.reverse))._1
    }
    val logged = evs.filter(e => e._2 % 2 == 1 && pol.contains(e._1))
    val nt = logged.size.toLong
    val rMatch = logged.filter(e => pol(e._1) == e._3).map(_._4).sum
    assert(total._2 === nt && total._4 === rMatch)
    assert(total._5 === rMatch * 5 * 10000 / nt, "IPS value")
  }

  test("q335 tokens are collision-free, deterministic, and preserve " +
    "event counts") {
    val rows = SparkEntry.queries("q335_pseudonymize_integrity")(
      spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall(_._3 === 1L), "a token maps to exactly one id")
    val nUsers = Tables.load(spark, dir, "events")
      .filter(col("user_id").isNotNull && col("event_id").isNotNull)
      .select("user_id").distinct().count()
    assert(rows.length.toLong === nUsers)
    val nEvents = Tables.load(spark, dir, "events")
      .filter(col("user_id").isNotNull && col("event_id").isNotNull)
      .count()
    assert(rows.map(_._2).sum === nEvents, "event mass preserved")
    // deterministic: recompute one token with JDK MessageDigest
    val uid = Tables.load(spark, dir, "events")
      .filter(col("user_id").isNotNull).select("user_id")
      .head().getLong(0)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(s"graft-pepper-2026:$uid"
        .getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 16)
    assert(rows.exists(_._1 == hex), s"token for uid $uid not found")
  }

  test("q336 raw NOT IN is vacuously empty, filtered NOT IN equals the " +
    "anti join, and Spark plans the raw form null-aware") {
    val got = SparkEntry.queries("q336_null_aware_anti_join")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("not_in_raw") === 0L,
      "NOT IN over a NULL-bearing list must select nothing")
    assert(got("not_in_nonnull") === got("anti_join") &&
      got("anti_join") > 0,
      "NULL-filtered NOT IN must agree with the anti join")
    // BroadcastHashJoinExec renders isNullAwareAntiJoin as the trailing
    // boolean: "LeftAnti, BuildRight, true"
    val plan = operators.SqlSurfaceOps.rawNotInFrame(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti, BuildRight, true") ||
      plan.contains("NullAware"),
      s"expected a null-aware anti join in:\n$plan")
  }
}
