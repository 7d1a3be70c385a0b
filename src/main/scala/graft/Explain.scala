package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time + explain one registered query.
  * Usage: graft.Explain <queryName> [sfDir] [explain|time|both]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val mode = if (args.length > 2) args(2) else "both"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (mode == "executed") {
      // final AQE plan AFTER execution (shows ColumnarToRow /
      // WholeStageCodegen spans the pre-execution formatted plan
      // hides). collect() executes THIS QueryExecution — a write would
      // plan its own and leave this one unexecuted (isFinalPlan=false).
      df.collect()
      println(df.queryExecution.executedPlan.toString)
    } else {
      if (mode != "time") df.explain("formatted")
      if (mode != "explain") {
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"[explain] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
