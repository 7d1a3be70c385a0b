package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q380 trending terms, q381 subject-access report. */
class ModernOps33Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q380 flags a planted trending term, and only it") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_q380_fix").toString
    // stable vocabulary on both halves, plus 'surge' appearing 5× in
    // half 0 and 20× in half 1 — a 4× mover; 'rare' misses min support
    // heavy stable mass: the surge must not shift total shares enough
    // to drag the stable vocabulary across the ±10% gate
    val docs = (0L until 40L).map { id =>
      val base = Seq.fill(10)("alpha beta gamma delta epsilon")
        .mkString(" ")
      val extra =
        if (id % 2 == 0 && id < 10) " surge" // 5 hits in half 0
        else if (id % 2 == 1) " surge"       // 20 hits in half 1
        else ""
      val rare = if (id == 0) " rare" else ""
      (id, base + extra + rare, "en", "web", 10L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("q380_trending_terms")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.map(_._1).toSeq === Seq("surge"),
      s"only the planted mover may be flagged, got ${got.toSeq}")
    val (_, fa, fb, ratio) = got.head
    assert((fa, fb) === ((5L, 20L)))
    // totals: half0 = 20·50 + 5 + 1(rare) = 1006, half1 = 20·50 + 20
    assert(ratio === 20L * 1006L * 10000L / (5L * 1020L))
    // the stable vocabulary must NOT be flagged even though totals
    // differ between halves (the cross-multiplied ratio normalizes)
    assert(!got.exists(_._1 == "alpha"))
  }

  test("q380 on the fixture corpus matches a plain replay") {
    val docs = Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull && col("doc_id").isNotNull)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val tf = docs.flatMap { case (id, t) =>
      t.toLowerCase.split(" ", -1).filter(_.nonEmpty)
        .map(term => (id % 2, term)) }
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val ta = tf.collect { case ((0L, _), f) => f }.sum
    val tb = tf.collect { case ((1L, _), f) => f }.sum
    val want = tf.keys.map(_._2).toSeq.distinct.flatMap { term =>
      val fa = tf.getOrElse((0L, term), 0L)
      val fb = tf.getOrElse((1L, term), 0L)
      if (fa >= 5 && fb >= 5) {
        val r = fb * ta * 10000 / (fa * tb)
        if (r >= 11000 || r <= 9090) Some(term -> (fa, fb, r)) else None
      } else None
    }.toMap
    val got = SparkEntry.queries("q380_trending_terms")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === want)
  }

  test("q381 footprints match a per-user replay of the sample") {
    val evs = Tables.load(spark, dir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .select("user_id", "ts", "event_type", "value").collect()
      .map { r =>
        val ts = r.getTimestamp(1)
        (r.getLong(0), ts.getTime * 1000 + ts.getNanos / 1000 % 1000,
          ts.toLocalDateTime.toLocalDate, r.getString(2),
          if (r.isNullAt(3)) None
          else Some((BigDecimal(r.getDouble(3)).setScale(2,
            BigDecimal.RoundingMode.HALF_UP) * 100).toLong))
      }
      .filter(e => Math.floorMod(e._1, 97L) == 7L)
    val want = evs.groupBy(_._1).map { case (u, xs) =>
      u -> (xs.length.toLong, xs.map(_._3).distinct.length.toLong,
        xs.map(_._2).min, xs.map(_._2).max,
        xs.collect { case (_, _, _, "purchase", Some(c)) => c }.sum,
        xs.map(_._4).distinct.length.toLong)
    }
    val got = SparkEntry.queries("q381_subject_access")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got === want)
    assert(got.keySet.forall(u => Math.floorMod(u, 97L) == 7L))
  }
}
