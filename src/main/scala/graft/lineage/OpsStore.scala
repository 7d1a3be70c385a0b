package graft.lineage

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Airflow operational-info store — the Spark re-design of the
  * reference's OperationalInfoStore (OperationalInfoStore.java:10-89):
  * a `task_property` table keyed by (dag_id, task_id, name) whose latest
  * `value` row resolves where a task's SQL actually lives. Backed by
  * parquet instead of a MySQL connection; lookups are metadata-sized
  * (one task's properties), collected on the driver like the
  * reference's single-row JDBC reads.
  */
final class AirflowOpsStore(spark: SparkSession, taskPropertyPath: String) {

  // Reference SPARK_CLASS_PATTERN (OperationalInfoStore.java:12).
  private val SparkClassPattern = """.*--class ([^ ]+).*""".r

  private lazy val df = spark.read.parquet(taskPropertyPath)

  /** Latest `value` of property `name` for DAG_ID.TASK_ID
    * (reference findAirflowHiveSqlSource, :37-56: ORDER BY updated DESC
    * LIMIT 1). */
  private def latest(dagTask: String, name: String): Option[String] =
    df.filter(concat_ws(".", col("dag_id"), col("task_id")) === dagTask &&
        col("name") === name)
      .orderBy(desc("updated"))
      .limit(1)
      .select("value")
      .collect()
      .headOption
      .map(_.getString(0))

  /** Hive task → the `bingql_sql_fn` property value. */
  def findAirflowHiveSqlSource(dagTask: String): Option[String] =
    latest(dagTask, "bingql_sql_fn")

  /** Spark task → the `--class` name inside `command_prefix`
    * (reference findAirflowSparkSqlSource, :58-82). */
  def findAirflowSparkSqlSource(dagTask: String): Option[String] =
    latest(dagTask, "command_prefix").flatMap {
      case SparkClassPattern(cls) => Some(cls)
      case _ => None
    }
}

/** Script-provenance inference (reference BatchProcessor.inferContext,
  * BatchProcessor.java:300-322): an airflow script's filename IS its
  * DAG_ID.TASK_ID (locator resolved through the ops store per language);
  * a dashboard script's filename is the id in the dashboard URL. */
object SourceContext {

  final case class Inferred(lockKey: String, locator: String)

  def infer(
      systemSource: String,
      sqlLang: String,
      fileName: String,
      fileExt: String,
      ops: Option[AirflowOpsStore]): Inferred = {
    val key = fileName.stripSuffix(fileExt)
    if (systemSource.equalsIgnoreCase("airflow")) {
      val resolved =
        if (sqlLang.equalsIgnoreCase("spark"))
          ops.flatMap(_.findAirflowSparkSqlSource(key))
        else ops.flatMap(_.findAirflowHiveSqlSource(key))
      Inferred(key, resolved.getOrElse(""))
    } else {
      // Reference hardcodes its dashboard URL prefix; ours is a neutral
      // placeholder with identical shape.
      Inferred(key, s"https://dashboards.example.com/v2/dashboard/$key")
    }
  }
}
