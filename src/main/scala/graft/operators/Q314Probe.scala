package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: isolate where q314's read time goes — whole-table listing
  * of the 1770-day layout vs explicit pruned-directory reads.
  * Usage: graft.operators.Q314Probe [sfDir]
  */
object Q314Probe {
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
    val (v1, v2) = LakehouseOps.writeEvolvedLayouts(spark, sfDir)
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    for (round <- 1 to 3) {
      println(s"--- round $round")
      t("full read v2 (listing+scan)")(
        spark.read.parquet(v2).filter(col("pd") >= "1997-01-01" &&
          col("pd") < "1997-03-01").count())
      spark.catalog.clearCache()
      val days = t("driver day-dir listing") {
        new java.io.File(v2).list().toSeq
          .filter(n => n.startsWith("pd=") &&
            n >= "pd=1997-01-01" && n < "pd=1997-03-01")
          .map(n => s"$v2/$n")
      }
      t(s"explicit ${days.length} dirs read")(
        spark.read.option("basePath", v2).parquet(days: _*)
          .filter(col("pd") >= "1997-01-01" && col("pd") < "1997-03-01")
          .count())
      spark.catalog.clearCache()
      t("full read v1 (bymonth)")(
        spark.read.parquet(v1).filter(col("pm") >= "1996-10" &&
          col("pm") <= "1997-02").count())
    }
    spark.stop()
  }
}
