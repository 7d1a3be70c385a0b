package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q328 k-anonymity ladder, q329 golden record, q330 isotonic fit. */
class ModernOps14Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q328 each doc gets the MINIMAL level reaching k, with the true " +
    "group size") {
    val got = SparkEntry.queries("q328_k_anonymity_ladder")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val docs = Tables.load(spark, dir, "documents")
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"), col("lang"), col("source"),
        expr("greatest(n_chars, 0) div 100").as("bf"),
        expr("greatest(n_chars, 0) div 1000").as("bc"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    def sizes[K](key: ((Long, String, String, Long, Long)) => K) =
      docs.groupBy(key).map { case (k, v) => k -> v.size.toLong }
    val c0 = sizes(d => (d._2, d._3, d._4)); val c1 = sizes(d => (d._2, d._3, d._5))
    val c2 = sizes(d => (d._2, d._3)); val c3 = sizes(d => d._2)
    docs.foreach { d =>
      val ladder = Seq(c0((d._2, d._3, d._4)), c1((d._2, d._3, d._5)),
        c2((d._2, d._3)), c3(d._2))
      val lvl = ladder.indexWhere(_ >= 3)
      val want = if (lvl < 0) (4L, 0L) else (lvl.toLong, ladder(lvl))
      assert(got(d._1) === want, s"ladder at doc ${d._1}")
    }
  }

  test("q329 survivorship picks the props of the strictly latest event") {
    val got = SparkEntry.queries("q329_golden_record")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    val evs = Tables.load(spark, dir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_id").isNotNull && col("event_id") >= 0)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), col("event_type"),
        coalesce(col("props"), lit("")).as("props"),
        expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4),
        if (r.isNullAt(5)) 0L else r.getLong(5)))
    assert(got.size === evs.map(_._1).distinct.length)
    evs.groupBy(_._1).foreach { case (u, es) =>
      val latest = es.maxBy(e => (e._2, e._3))
      val purch = es.filter(_._4 == "purchase")
      val want = (latest._5, es.map(_._2).min, es.map(_._2).max,
        es.size.toLong, purch.map(_._6).sum,
        if (purch.isEmpty) -1L else purch.map(_._2).max)
      assert(got(u) === want, s"golden record at user $u")
    }
  }

  test("q330 fit is monotone and equals pool-adjacent-violators") {
    val rows = SparkEntry.queries("q330_isotonic_calibration")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._5 <= b._5 + 1e-12,
          s"isotonic fit must be monotone: bin ${a._1}=${a._5} > " +
            s"bin ${b._1}=${b._5}")
      case _ =>
    }
    // classic PAVA: merge adjacent pools while out of order
    case class Pool(s: Long, c: Long) { def a: Double = s.toDouble / c }
    val pools = scala.collection.mutable.ArrayBuffer.empty[(Pool, Int)]
    rows.foreach { r =>
      pools += ((Pool(r._3, r._2), 1))
      while (pools.size > 1 &&
        pools(pools.size - 2)._1.a > pools.last._1.a) {
        val (p2, n2) = pools.remove(pools.size - 1)
        val (p1, n1) = pools.remove(pools.size - 1)
        pools += ((Pool(p1.s + p2.s, p1.c + p2.c), n1 + n2))
      }
    }
    val pava = pools.flatMap { case (p, n) => Seq.fill(n)(p.a) }
    rows.map(_._5).zip(pava).zipWithIndex.foreach {
      case ((gotF, wantF), i) =>
        assert(math.abs(gotF - wantF) < 1e-9,
          s"minimax fit differs from PAVA at position $i")
    }
  }
}
