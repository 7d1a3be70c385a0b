package graft.plans

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asof join picks greatest right time <= left time, per key, left-outer") {
    val left = Seq(
      (1L, 10L, "l1"), (1L, 20L, "l2"), (2L, 15L, "l3"), (3L, 5L, "l4"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, 5L, "r-a"), (1L, 10L, "r-b"), (1L, 19L, "r-c"),
      (2L, 30L, "r-d"))
      .toDF("rk", "rt", "rtag")
    val got = AsOfJoinApi.asofJoin(left, right, "k", "rk", "t", "rt")
      .select("k", "t", "tag", "rtag")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)).getOrElse("-"))).toSet
    assert(got == Set(
      (1L, 10L, "l1", "r-b"), // inclusive: rt == lt matches
      (1L, 20L, "l2", "r-c"),
      (2L, 15L, "l3", "-"),   // only future right rows -> null
      (3L, 5L, "l4", "-")))   // no right key -> null
  }

  test("asof join treats null keys/times as unmatched, not a crash") {
    val left = Seq(
      (Option(1L), Option(10L), "ok"),
      (Option.empty[Long], Option(10L), "nullkey"),
      (Option(1L), Option.empty[Long], "nulltime"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (Option(1L), Option(5L), "r-a"),
      (Option.empty[Long], Option(1L), "r-nullk"),
      (Option(1L), Option.empty[Long], "r-nullt"))
      .toDF("rk", "rt", "rtag")
    val got = AsOfJoinApi.asofJoin(left, right, "k", "rk", "t", "rt")
      .select("tag", "rtag")
      .collect().map(r => (r.getString(0), Option(r.getString(1)).getOrElse("-"))).toSet
    assert(got == Set(
      ("ok", "r-a"),        // normal match survives the null traffic
      ("nullkey", "-"),     // null left key -> unmatched row, not an NPE
      ("nulltime", "-")))   // null left time -> unmatched row
  }

  test("asof join handles many left rows per key monotonically") {
    val left = (1L to 100L).map(i => (7L, i)).toDF("k", "t")
    val right = Seq((7L, 10L, "early"), (7L, 50L, "late")).toDF("rk", "rt", "rtag")
    val got = AsOfJoinApi.asofJoin(left, right, "k", "rk", "t", "rt")
      .selectExpr("t", "rtag").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("-")))
    assert(got.count(_._2 == "-") == 9)       // t in 1..9
    assert(got.count(_._2 == "early") == 40)  // t in 10..49
    assert(got.count(_._2 == "late") == 51)   // t in 50..100
  }
}
