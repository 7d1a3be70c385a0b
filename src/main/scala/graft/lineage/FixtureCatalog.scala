package graft.lineage

import org.apache.spark.sql.SparkSession

/** Registers the reference's fixture catalog (test_cases/setup.sh — see
  * FIXTURES.md §1) into the Spark session catalog so the Analyzer can
  * resolve the ported test SQL. Schema-only external tables; no data.
  */
object FixtureCatalog {

  val ddl: Seq[(String, String, String)] = Seq(
    ("dw", "tab10", "col100l bigint, col101s string, col102b boolean, col103i int"),
    ("dw", "tab20", "col200l bigint, col201s string, col202b boolean, col203i int"),
    ("stage", "tab30", "col300l bigint, col301s string, col302b boolean, col303i int"),
    ("adhoc", "tab40", "col400l bigint, col401s string, " +
      "col402x array<struct<user:struct<id:bigint>,group:struct<id:bigint>,is_bot:boolean>>, " +
      "col403i int"))

  def register(spark: SparkSession): Unit = synchronized {
    val base = "file:///tmp/graft_wh"
    ddl.foreach { case (db, tbl, cols) =>
      spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$base/$db.db'")
      spark.sql(
        s"""CREATE TABLE IF NOT EXISTS $db.$tbl ($cols)
           |USING parquet LOCATION '$base/$db/$tbl'""".stripMargin)
    }
  }

  /** Drop-and-recreate a target table some test SQL writes into.
    * Synchronized: parallel BatchRunner workers share the external
    * catalog, and an unsynchronized DROP+CREATE pair racing on the same
    * name throws TableAlreadyExists in one worker. (Two FILES creating
    * the same table still last-write-win semantically — same as the
    * reference's thread-per-chunk batch; keep shared staging-table
    * names out of a parallel corpus.) */
  def ensureTable(spark: SparkSession, db: String, tbl: String, cols: String): Unit = synchronized {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION 'file:///tmp/graft_wh/$db.db'")
    spark.sql(s"DROP TABLE IF EXISTS $db.$tbl")
    spark.sql(
      s"""CREATE TABLE $db.$tbl ($cols)
         |USING parquet LOCATION 'file:///tmp/graft_wh/$db/$tbl'""".stripMargin)
  }
}
