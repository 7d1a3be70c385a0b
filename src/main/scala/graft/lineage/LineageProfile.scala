package graft.lineage

import org.apache.spark.sql.SparkSession

/** Dev tool: phase-level timing of the lineage fixture choreography that
  * dominates q94/q105/q116/q124 (r16 verdict #7). Counts Spark jobs per
  * phase so fixed per-job cost is visible next to wall time.
  * Usage: graft.lineage.LineageProfile [sfDir]
  */
object LineageProfile {
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
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    def phase[T](name: String)(f: => T): T = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ${jobs.get() - j0}%3d jobs")
      r
    }
    // one throwaway run to absorb session DDL/JIT, mirroring the bench warmup
    phase("warmup run")(LineageRunner.run(spark, "SELECT * FROM dw.tab10;"))

    for (round <- 1 to 2) {
      println(s"--- q124 shape, round $round")
      val script =
        """select col100l from dw.tab10 where col100l > 0;
          |select col201s, count(1) as cnt from dw.tab20 group by col201s;""".stripMargin
      val store = "/tmp/graft_prof_store"
      val res777 = phase("q124 LineageRunner 777")(LineageRunner.run(spark, script))
      phase("q124 LineageStore.write")(
        LineageStore.write(spark, "777.sql", res777, store, system = "dashboard"))
      phase("q124 writeDashboards")(SideTables.writeDashboards(spark,
        Seq((777L, "Daily teams", 1500000000L, 1600000000L, "ana.lyst")),
        "/tmp/graft_prof_dboard"))
      phase("q124 writeSymlinks")(SideTables.writeSymlinks(spark,
        Seq(("dw", "tab10", "dw", "tab10_latest", "LatestOperator",
          "s3://bucket/dw/tab10/latest", "etl_dag.link_latest")),
        "/tmp/graft_prof_symlink"))
      val res10 = phase("q124 LineageRunner 0010")(
        LineageRunner.run(spark, graft.operators.LineageQueries.scripts("0010")))
      import spark.implicits._
      val tableEdges = phase("q124 edges toDF") {
        res10.edges.collect {
          case (tgt, e) if tgt.nonEmpty && e.parentTable != tgt =>
            (tgt, s"${e.parentSchema}.${e.parentTable}")
        }.distinct.toDF("child", "parent")
      }
      val closed = phase("q124 closeWithSymlinks") {
        SideTables.closeWithSymlinks(
          tableEdges, spark.read.parquet("/tmp/graft_prof_symlink")).collect()
      }
      println(s"[prof] closed rows: ${closed.length}")
      phase("q124 dashboardLineage+reads") {
        val boards = spark.read.parquet("/tmp/graft_prof_dboard").collect()
        val cols = SideTables.dashboardLineage(spark, Seq(store)).collect()
        val links = spark.read.parquet("/tmp/graft_prof_symlink").collect()
        (boards.length, cols.length, links.length)
      }
      println(s"--- q105 shape, round $round")
      val res6 = phase("q105 LineageRunner 0006")(
        LineageRunner.run(spark, graft.operators.LineageQueries.scripts("0006")))
      phase("q105 LineageStore.write")(
        LineageStore.write(spark, "0006.sql", res6, s"$store-q105/0006"))
      phase("q105 full query") {
        graft.SparkEntry.queries("q105_metastore_schemas")(spark, sfDir).count()
      }
      phase("q124 full query") {
        graft.SparkEntry.queries("q124_side_tables")(spark, sfDir).count()
      }
      phase("q94 full query") {
        graft.SparkEntry.queries("q94_lineage_batch_store")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
