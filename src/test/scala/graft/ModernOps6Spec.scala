package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q307 MMR and q308 Holt: both are recursive computations, so each
  * spec replays the recursion from first principles in plain Scala and
  * pins the property that justifies the operator (diversity actually
  * bought, trend actually tracked).
  */
class ModernOps6Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def vecsById(): Map[Long, Array[Double]] =
    Tables.load(spark, dir, "embeddings").collect().map { r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray
    }.toMap

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    def dot(x: Array[Double], y: Array[Double]) =
      x.indices.foldLeft(0.0)((s, i) => s + x(i) * y(i))
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  }

  test("q307 replays the greedy MMR recursion and buys diversity") {
    val rows = SparkEntry.queries("q307_mmr_diverse_topk")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length === 10)
    val vs = vecsById()
    val probe = vs(0L)
    val cand = vs.keys.filter(_ > 0).toSeq.sorted
    // plain-Scala greedy replay
    var sel = Vector.empty[Long]
    for (_ <- 1 to 10) {
      val pick = cand.filterNot(sel.contains).map { id =>
        val rel = cos(vs(id), probe)
        val pen = if (sel.isEmpty) 0.0 else sel.map(s => cos(vs(id), vs(s))).max
        val score = if (sel.isEmpty) 0.7 * rel else 0.7 * rel - 0.3 * pen
        (id, score)
      }.minBy { case (id, sc) => (-sc, id) }
      sel :+= pick._1
    }
    assert(rows.map(_._2).toSeq === sel,
      "Spark MMR selection must equal the plain-Scala greedy replay")
    // diversity: the MMR set's worst (max) intra-pair similarity must
    // not exceed the pure-relevance top-10's
    def maxPair(ids: Seq[Long]) = (for {
      i <- ids; j <- ids if i < j
    } yield cos(vs(i), vs(j))).max
    val byRel = cand.sortBy(id => (-cos(vs(id), probe), id)).take(10)
    assert(maxPair(sel) <= maxPair(byRel),
      s"MMR must not be LESS diverse than pure relevance top-k")
    // rank 1 is the pure-relevance argmax
    assert(rows.head._2 === byRel.head)
  }

  test("q308 replays the Holt recursion per user") {
    val rows = SparkEntry.queries("q308_holt_smoothing")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    // recompute one user's series from the raw events
    val (uid, nDays, level, trend, forecast) = rows.head
    val daily = Tables.load(spark, dir, "events")
      .filter(col("user_id") === uid && col("value").isNotNull)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(col("value").cast("decimal(18,4)")).cast("double").as("x"))
      .orderBy("d").collect().map(_.getDouble(1))
    assert(daily.length.toLong === nDays)
    var l = daily.head
    var b = 0.0
    daily.tail.foreach { x =>
      val nl = 0.5 * x + 0.5 * (l + b)
      val nb = 0.5 * ((0.5 * x + 0.5 * (l + b)) - l) + 0.5 * b
      l = nl; b = nb
    }
    assert(level === l)
    assert(trend === b)
    assert(forecast === l + b)
  }
}
