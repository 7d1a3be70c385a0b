package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (guide: one per suite via
  * lazy val; we share across suites since Test/fork gives one JVM). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // Spark 4.1's HybridAnalyzer dual-runs every plan through the legacy
      // fixed-point AND the new single-pass resolver to cross-validate
      // them, roughly doubling analysis cost -- a fixed per-query tax that
      // dominated short queries (q01: 4.2s -> 1.7s with it off). One
      // analysis pass is enough here.
      .config("spark.sql.analyzer.singlePassResolver.dualRunWithLegacy", "false")
      .config("spark.sql.warehouse.dir", "file:///tmp/graft_test_wh")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}
