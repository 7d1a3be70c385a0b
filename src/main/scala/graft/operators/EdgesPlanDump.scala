package graft.operators

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the formatted plan of the shared co-supply edge
  * projection ([[GraphOps.edges]]) — the part of q209/q212/q242/q243
  * that runs inside their eager `localCheckpoint` and is therefore
  * invisible in the registered queries' own `explain` output.
  * Usage: graft.operators.EdgesPlanDump [sfDir]
  */
object EdgesPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraphOps.edges(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
