package graft.lineage

import org.apache.spark.sql.SparkSession

// Throwaway: print parsed plan classes for round-2 DDL statements.
object ParseProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val stmts = Seq(
      "ALTER TABLE dw.tab10 ADD PARTITION (dt='2020-01-01') LOCATION 's3://bucket/x/dt=2020-01-01'",
      "ALTER TABLE dw.tab10 ADD IF NOT EXISTS PARTITION (dt='2020-01-02')",
      "CREATE TABLE dw.tab_like LIKE dw.tab10",
      "INSERT OVERWRITE DIRECTORY '/tmp/iod' USING parquet SELECT col100l FROM dw.tab10",
      "INSERT OVERWRITE DIRECTORY '/tmp/iod' SELECT col100l FROM dw.tab10",
      "SHOW TABLES",
      "SHOW TABLES IN dw",
      "DESCRIBE dw.tab10",
      "SHOW PARTITIONS dw.tab10",
      "TRUNCATE TABLE dw.tab10",
      "CREATE TABLE dw.loc_tab (a INT) STORED AS ORC LOCATION 's3://bucket/loc_tab'")
    stmts.foreach { st =>
      val p = try s.sessionState.sqlParser.parsePlan(st).getClass.getName
      catch { case e: Exception => "PARSE-ERR: " + e.getMessage.take(80) }
      println(s"$p   <<<   $st")
    }
    val alter = s.sessionState.sqlParser.parsePlan(stmts.head)
    println(alter.treeString)
    val like = s.sessionState.sqlParser.parsePlan("CREATE TABLE dw.tab_like LIKE dw.tab10")
    println(like.treeString)
    val iod = s.sessionState.sqlParser.parsePlan(stmts(4))
    println(iod.treeString)
  }
}
