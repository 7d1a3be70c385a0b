package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run ad-hoc SQL against the registered tables and show it.
  * Usage: graft.SqlRun <sfDir> <sql...>  (sql joined from remaining args)
  */
object SqlRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val sql = args.drop(1).mkString(" ")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)
    spark.sql(sql).show(100, truncate = false)
    spark.stop()
  }
}
