package graft.lineage

import org.apache.spark.sql.SparkSession

/** Dev tool: run the walker over a reference test case and print what it
  * sees. Usage: graft.lineage.LineageDebug <caseFile|-> [plan]
  */
object LineageDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", "file:///tmp/graft_wh_cat")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    FixtureCatalog.register(spark)
    val script =
      if (args(0) == "-") scala.io.Source.stdin.mkString
      else scala.io.Source.fromFile(args(0)).mkString
    val showPlan = args.length > 1 && args(1) == "plan"
    if (args.length > 1 && args(1) == "runner") {
      val res = LineageRunner.run(spark, script)
      res.edges.foreach { case (tgt, e) =>
        println(f"  ${if (tgt.isEmpty) "-" else tgt}%-22s ${e.outColumn}%-12s <- ${e.parentSchema}.${e.parentTable}.${e.parentColumn}%-26s ${e.context}")
      }
      res.inserts.foreach(t => println(s"  INSERT: ${t.dbSchema}.${t.dbTable} [${t.insertType}]"))
      spark.stop(); return
    }
    SqlPreprocessor.preprocess(script).foreach { stmt =>
      println(s"----- STMT: ${stmt.linesIterator.next().take(90)}")
      try {
        val parsed = spark.sessionState.sqlParser.parsePlan(stmt)
        println(s"parsed root: ${parsed.getClass.getSimpleName}")
        if (showPlan) println(parsed.treeString)
        if (parsed.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.SetCatalogAndNamespace] ||
            stmt.trim.toLowerCase.startsWith("use ") ||
            stmt.trim.toLowerCase.startsWith("create table")) {
          spark.sql(stmt) // DDL / session state
          println("(executed as DDL)")
        } else {
          if (showPlan) {
            val analyzed = LineageWalker.analyze(spark, stmt)
            println(s"analyzed root: ${analyzed.getClass.getName}")
            println(analyzed.treeString)
          }
          val edges = LineageWalker.columnEdges(spark, stmt)
          edges.foreach(e => println(f"  ${e.outColumn}%-12s <- ${e.parentSchema}.${e.parentTable}.${e.parentColumn}%-28s ${e.context}"))
          val ins = LineageWalker.tableInserts(spark, stmt)
          ins.foreach(t => println(s"  INSERT: ${t.dbSchema}.${t.dbTable} [${t.insertType}]"))
        }
      } catch { case e: Throwable =>
        println(s"  ERROR: ${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.next()}")
        if (showPlan) e.printStackTrace()
      }
    }
    spark.stop()
  }
}
