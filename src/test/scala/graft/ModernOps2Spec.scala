package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 surfaces, part 2 (q291–q294): independent recomputations —
  * the stream/batch twin equality for dynamic-gap sessions, the
  * SemDeDup containment properties, a hand-rolled RRF over the two
  * modality rank lists, and an exact bottom-k median replay in plain
  * Scala.
  */
class ModernOps2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q291 streaming dynamic-gap sessions equal the q288 batch twin") {
    val stream = SparkEntry.queries("q291_stream_dynamic_gap_sessions")(
      spark, dir).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val batch = SparkEntry.queries("q288_dynamic_gap_sessions")(
      spark, dir).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(stream.nonEmpty)
    assert(stream.toSeq === batch.toSeq,
      "append-mode streaming sessionization must emit exactly the " +
        "sessions the batch session_window computes")
  }

  test("q292 semantic dedup: dups have a smaller-id same-cell witness") {
    val rows = SparkEntry.queries("q292_semantic_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3)))
    assert(rows.map(_._1).toSet.size === rows.length, "one row per vector")
    val cellOf = rows.map(r => r._1 -> r._2).toMap
    val dups = rows.filter(_._4)
    assert(dups.nonEmpty, "threshold must actually fire on the corpus")
    dups.foreach { case (id, cell, dupOf, _) =>
      assert(dupOf.isDefined && dupOf.get < id,
        s"dup_of must be a smaller id for $id")
      assert(cellOf(dupOf.get) === cell,
        s"witness ${dupOf.get} must share $id's cell $cell")
    }
    // cluster-scoping: every q123 GLOBAL near-dup pair that happens to be
    // co-cell must be found by the cluster-scoped pass too
    val global = SparkEntry.queries("q123_embedding_neardup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val dupIds = dups.map(_._1).toSet
    val missed = global.filter { case (b, a) =>
      cellOf.get(a).exists(c => cellOf.get(b).contains(c)) &&
        !dupIds.contains(b)
    }
    assert(missed.isEmpty,
      s"co-cell global near-dups must be caught: $missed")
  }

  test("q293 RRF fusion equals a hand fold of the two rank lists") {
    val got = SparkEntry.queries("q293_hybrid_retrieval_rrf")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq === (1L to sorted.length).toSeq)
      // fused order is (rrf DESC, doc_id ASC)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2))
        case _ =>
      }
    }
    // every fused score decomposes into at most two RRF terms with
    // ranks <= 20: floor(1e6/(60+r1)) [+ floor(1e6/(60+r2))]
    val terms = (1 to 20).map(r => 1000000L / (60 + r)).toSet
    val sums = (for (a <- terms; b <- terms) yield a + b) ++ terms
    got.foreach { case (_, _, rrf, _) =>
      assert(sums.contains(rrf), s"rrf $rrf is not a valid term sum")
    }
  }

  test("q294 KMV medians equal an exact bottom-k replay in plain Scala") {
    val got = SparkEntry.queries("q294_kmv_quantile_rollup")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val base = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"),
        year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
      .collect().map { r =>
        val cents = java.math.BigDecimal.valueOf(r.getDouble(1))
          .setScale(2, java.math.RoundingMode.HALF_UP)
          .movePointRight(2).longValueExact()
        val key = r.getLong(0)
        (r.getInt(2), r.getInt(3), key,
          (key * 2654435761L) % 1000000007L,
          (cents + 10000000000L) * 100000000L + key)
      }
    def kmvMedian(rows: Seq[(Long, Long)]): Long = {
      val sample = rows.sortBy(identity).take(64).map(_._2).sorted
      sample((sample.length + 1) / 2 - 1) / 100000000L - 10000000000L
    }
    val expect =
      base.groupBy(r => ("month", f"${r._1}%04d-${r._2}%02d")).map {
        case (k, rs) => (k._1, k._2, rs.length.toLong,
          kmvMedian(rs.map(r => (r._4, r._5)).toSeq))
      } ++
      base.groupBy(r => ("year", r._1.toString)).map { case (k, rs) =>
        (k._1, k._2, rs.length.toLong, kmvMedian(rs.map(r => (r._4, r._5)).toSeq))
      } ++ Seq(("all", "all", base.length.toLong,
        kmvMedian(base.map(r => (r._4, r._5)).toSeq)))
    assert(got.toSeq.sorted === expect.toSeq.sorted)
    // the 'all' estimate is within sampling error of the EXACT median:
    // 64 uniform keys put the sample median's rank within the central
    // half of the distribution with overwhelming probability
    val exact = base.map(_._5 / 100000000L - 10000000000L).sorted
      .apply(base.length / 2)
    val est = got.find(_._1 == "all").get._4
    val cents = base.map(_._5 / 100000000L - 10000000000L).sorted
    val rankOfEst = cents.indexWhere(_ >= est).toDouble / cents.length
    assert(rankOfEst > 0.25 && rankOfEst < 0.75,
      s"KMV median estimate $est (rank $rankOfEst) vs exact $exact")
  }

  test("q295 scripted threshold search equals a plain-Scala loop") {
    val got = SparkEntry.queries("q295_sql_scripting")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val prices = Tables.load(spark, dir, "orders")
      .select("o_totalprice").collect()
      .filter(!_.isNullAt(0)).map(_.getDouble(0))
    var thr = 1000.0; var iters = 0L
    var n = prices.count(_ > thr).toLong
    while (n >= 100) {
      thr *= 2; iters += 1; n = prices.count(_ > thr).toLong
    }
    assert(got.toSeq === Seq((thr.toLong, n, iters)))
  }

  test("q296 SQL UDF + TVF equal the inlined spelling") {
    val got = SparkEntry.queries("q296_sql_udf_tvf")(spark, dir).collect()
    Tables.registerAll(spark, dir)
    val inlined = spark.sql(
      """SELECT q.qtr AS qtr,
        |  CASE WHEN o.o_totalprice IS NULL THEN 'null'
        |       WHEN o.o_totalprice < 50000 THEN 'lo'
        |       WHEN o.o_totalprice < 200000 THEN 'mid'
        |       ELSE 'hi' END AS band,
        |  count(*) AS n,
        |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS STRING)
        |    AS revenue
        |FROM orders o JOIN (SELECT * FROM VALUES (1, 1, 3), (2, 4, 6),
        |  (3, 7, 9), (4, 10, 12) AS t(qtr, mlo, mhi)) q
        |  ON month(o.o_orderdate) BETWEEN q.mlo AND q.mhi
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin).collect()
    assert(got.toSeq === inlined.toSeq)
    assert(got.length === 12, "4 quarters x 3 bands on sf0.001")
  }

  test("q297 streaming KMV sketch equals a plain-Scala bottom-64 replay") {
    val got = SparkEntry.queries("q297_stream_kmv_quantiles")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val base = Tables.load(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select("event_id", "event_type", "value").collect().map { r =>
        val cents = java.math.BigDecimal.valueOf(r.getDouble(2))
          .setScale(2, java.math.RoundingMode.HALF_UP)
          .movePointRight(2).longValueExact()
        val id = r.getLong(0)
        (r.getString(1), id, (id * 2654435761L) % 1000000007L, cents)
      }
    val expect = base.groupBy(_._1).map { case (t, rs) =>
      val sample = rs.sortBy(r => (r._3, r._2)).take(64)
        .map(r => (r._4, r._2)).sorted
      (t, rs.length.toLong, sample((sample.length + 1) / 2 - 1)._1)
    }
    assert(got.toSeq.sorted === expect.toSeq.sorted)
  }
}
