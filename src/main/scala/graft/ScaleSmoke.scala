package graft

import org.apache.spark.sql.SparkSession

/** Scale smoke: time a list of registered queries at two data dirs and
  * report the wall-clock ratio — the check that no query goes
  * super-linear when the data scales (BASELINE.md records the results;
  * VERDICT r3 item 10).
  *
  * Usage: graft.ScaleSmoke <dirA> <dirB> <q1,q2,...>
  * Prints one JSON line: {"queries":{name:{"a":s,"b":s,"ratio":r}},...}.
  * Each query runs once untimed at BOTH dirs (warmup: codegen + JIT +
  * file listing + footer reads per dir), then timed at dirA and dirB —
  * a cold dirB read otherwise reports IO/JIT noise as super-linearity.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val Array(dirA, dirB, qlist) = args.take(3)
    val names = qlist.split(",").map(_.trim).filter(_.nonEmpty).toSeq
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
    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      System.gc()
      dt
    }
    // Locale.ROOT: the f-interpolator honors the JVM default locale, and
    // a comma-decimal locale would emit unparseable JSON.
    def num(v: Double, digits: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${digits}f", Double.box(v))
    def jstr(s0: String): String =
      "\"" + s0.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val rows = names.map { n =>
      time(n, dirA); time(n, dirB) // warmup both dirs
      val a = time(n, dirA)
      val b = time(n, dirB)
      System.err.println(
        s"[smoke] $n: a=${num(a, 2)} b=${num(b, 2)} ratio=${num(b / a, 2)}")
      s"""${jstr(n)}:{"a":${num(a, 3)},"b":${num(b, 3)},"ratio":${num(b / a, 2)}}"""
    }
    println(s"""{"dirA":${jstr(dirA)},"dirB":${jstr(dirB)},"queries":${rows.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
