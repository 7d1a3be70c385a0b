package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q311 streaming drift gate: the streaming-incremental contingency
  * counts must yield the byte-identical statistic to a batch scan. */
class StreamingOps3Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q311 streaming chi-square equals the batch twin") {
    val got = SparkEntry.queries("q311_stream_drift_gate")(spark, dir)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val w = org.apache.spark.sql.expressions.Window
    val batch = Tables.load(spark, dir, "events")
      .filter(col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("d"), col("event_type"))
      .agg(count(lit(1)).as("o"))
      .withColumn("r", sum("o").over(w.partitionBy("d")))
      .withColumn("c", sum("o").over(w.partitionBy("event_type")))
      .withColumn("n", sum("o").over(w.partitionBy()))
      .withColumn("term_micro", expr(
        """CAST(round(CAST(o*n - r*c AS DOUBLE) * CAST(o*n - r*c AS DOUBLE)
          |  / (CAST(r AS DOUBLE)*c*n) * 1000000) AS BIGINT)""".stripMargin))
      .groupBy("d")
      .agg(count(lit(1)).as("n_types"),
        max("r").cast("long").as("day_events"),
        sum("term_micro").cast("long").as("chi2_micro"))
      .orderBy("d")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3)))
    assert(got.toSeq === batch.toSeq,
      "streaming-maintained counts must reproduce the batch statistic")
    // sanity: every day's chi2 is non-negative and day totals sum to
    // the corpus total
    assert(got.forall(_._4 >= 0))
    val totalEvents = Tables.load(spark, dir, "events")
      .filter(col("ts").isNotNull).count()
    assert(got.map(_._3).sum === totalEvents)
  }
}
