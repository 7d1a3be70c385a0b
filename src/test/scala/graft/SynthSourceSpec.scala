package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom DSv2 generator source (graft.sources.SynthEventsSource):
  * pushdown contracts pinned on the executed plan, plus a plain-Scala
  * replay of the q255 aggregate. */
class SynthSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def synth(rows: Long, slices: Int) =
    spark.read.format("graft.sources.SynthEventsSource")
      .option("rows", rows.toString).option("slices", slices.toString).load()

  test("event_id range pushes into the generator; filter node vanishes") {
    val df = synth(1000, 4)
      .filter(col("event_id") >= 100L && col("event_id") < 900L)
      .select("event_id", "cents")
    assert(df.count() === 800)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("range=[100,900)"), s"range not narrowed: $p")
    // A Filter NODE prints as "Filter (cond)"; the always-present
    // "RuntimeFilters: []" suffix must not trip this.
    assert(!p.contains("Filter ("), "fully-pushed predicate re-evaluated post-scan")
  }

  test("column pruning reaches the generator") {
    val df = synth(100, 2).select("cents")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("cols=cents"), s"generator materializes unprojected columns: $p")
  }

  test("partition planning honors slices") {
    assert(synth(1000, 4).rdd.getNumPartitions === 4)
    // Narrow ranges can't produce empty slices.
    assert(synth(10, 32).rdd.getNumPartitions <= 10)
  }

  test("residual predicates stay post-scan and semantics hold") {
    val df = synth(1000, 4)
      .filter(col("event_id") >= 100L && col("user_id") % 3 === 0)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("range=[100,1000)"))
    assert(p.contains("Filter ("), "residual user_id predicate lost")
    val expected = (100L until 1000L)
      .count(i => graft.sources.SynthEventsSource.userId(i) % 3 == 0)
    assert(df.count() === expected)
  }

  test("micro-batch stream admits batchRows per trigger and drains losslessly") {
    val sink = s"graft_synth_stream_spec_${System.nanoTime()}"
    val q = spark.readStream.format("graft.sources.SynthEventsSource")
      .option("rows", "1000").option("batchRows", "300").option("slices", "2")
      .load()
      .groupBy().agg(count(lit(1)).as("n"), sum("cents").as("s"))
      .writeStream.format("memory").queryName(sink)
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val withData = q.recentProgress.filter(_.numInputRows > 0)
    assert(withData.length === 4, "expected 300+300+300+100 admission")
    assert(withData.map(_.numInputRows).max <= 300)
    assert(withData.map(_.numInputRows).sum === 1000)
    val r = spark.table(sink).head()
    assert(r.getLong(0) === 1000L)
    assert(r.getLong(1) ===
      (0L until 1000L).map(graft.sources.SynthEventsSource.cents).sum)
  }

  test("stream restart from checkpoint resumes offsets exactly-once") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_synth_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_synth_out").toString
    def start() = spark.readStream.format("graft.sources.SynthEventsSource")
      .option("rows", "1000").option("batchRows", "250").option("slices", "2")
      .load()
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .start()
    // First run is killed early (wherever it lands mid-interval); the
    // restart must resume FROM THE CHECKPOINTED OFFSET — through
    // deserializeOffset — and finish with neither loss nor dups (the
    // file sink's commit log makes a replayed partial batch invisible).
    val q1 = start()
    Thread.sleep(2000); q1.stop()
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(outDir)
    assert(got.count() === 1000L)
    assert(got.select("event_id").distinct().count() === 1000L)
  }

  test("aggregate pushdown answers count/min/max in O(1), no HashAggregate") {
    val df = synth(2000000000L, 32)
      .filter(col("event_id") >= 500000L && col("event_id") < 1500000000L)
      .agg(count(lit(1)).as("n"), min("event_id").as("min_id"),
        max("event_id").as("max_id"))
    val r = df.head()
    assert(r.getLong(0) === 1499500000L)
    assert(r.getLong(1) === 500000L)
    assert(r.getLong(2) === 1499999999L)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AGG-PUSHDOWN"), "aggregates not pushed:\n" + p)
    assert(!p.contains("HashAggregate"),
      "complete pushdown still re-aggregates:\n" + p)
    // empty interval: count 0, null min/max
    val e = synth(100, 2).filter(col("event_id") >= 200L)
      .agg(count(lit(1)).as("n"), min("event_id").as("m")).head()
    assert(e.getLong(0) === 0L)
    assert(e.isNullAt(1))
    // unsupported aggregate (sum of cents) falls back to generation
    val f = synth(1000, 2).agg(sum("cents").as("s"))
    assert(f.queryExecution.executedPlan.toString.contains("HashAggregate"))
    assert(f.head().getLong(0) ===
      (0L until 1000L).map(graft.sources.SynthEventsSource.cents).sum)
  }

  test("limit pushdown truncates generation; no post-scan limit node") {
    val df = synth(2000000000L, 32)
      .filter(col("event_id") >= 1000000L).limit(500)
    assert(df.count() === 500)
    val ids = df.select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.head === 1000000L && ids.last === 1000499L)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("range=[1000000,1000500)"),
      "limit not folded into the generated interval:\n" + p)
  }

  test("q255 equals the closed-form replay") {
    val expected = (250000L until 1750000L)
      .filter(i => graft.sources.SynthEventsSource.userId(i) % 3 == 0)
      .groupBy(graft.sources.SynthEventsSource.eventType)
      .map { case (t, is) =>
        t -> (is.size.toLong, is.map(graft.sources.SynthEventsSource.cents).sum,
          is.min, is.max)
      }
    val got = SparkEntry.queries("q255_synth_source")(spark, "unused")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === expected)
  }
}
