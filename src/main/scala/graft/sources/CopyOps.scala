package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Bulk load/export — the Spark-first re-expression of the reference's
  * COPY statements (Vertica/Teradata heritage: `COPY FROM LOCAL src TO
  * tgt`, `COPY (table|query) TO [HDFS] tgt` — Bingql.g4:770-797, and the
  * Sqoop side-table flow `db_setup_ddl.sql:192-200`; parse-only in the
  * reference, executed here).
  *
  * Scale shape: an explicit schema means NO inference pass (inference
  * reads every file twice — a non-starter at 100 TB); loads parallelize
  * per input split, exports per partition. Delimited options mirror the
  * reference's copy_file_option list (delimiter/skip/enclosed).
  */
object CopyOps {

  /** COPY FROM LOCAL <paths> TO <table-or-view>: load delimited files.
    * The explicit `schema` is mandatory by design — the 100 TB path
    * cannot afford an inference scan. */
  def copyFromLocal(
      spark: SparkSession,
      paths: Seq[String],
      schema: StructType,
      delimiter: String = ",",
      header: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("delimiter", delimiter)
      .option("header", header.toString)
      .csv(paths: _*)

  /** COPY <df> TO <dir>: export as delimited files, one per partition. */
  def copyTo(
      df: DataFrame,
      path: String,
      delimiter: String = ",",
      header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("delimiter", delimiter)
      .option("header", header.toString)
      .csv(path)
}
