package graft.lineage

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed lineage store mirroring the reference's MySQL schema
  * (db_setup_ddl.sql:24-190 → FIXTURES.md §3): one table per entity,
  * idempotent writes via deterministic content-hash ids + dropDuplicates
  * (replacing REPLACE INTO / INSERT IGNORE, SURVEY §4.1).
  */
object LineageStore {

  /** Content-addressed id — replaces the reference's AutoIncrement
    * counter (util/AutoIncrement.java:10-25): stable across distributed
    * runs and reruns. */
  private def idOf(parts: Column*): Column = abs(xxhash64(parts: _*))

  /** Persist one script's lineage under `path` (overwrite per source). */
  def write(spark: SparkSession, sourceLocator: String,
      result: LineageRunner.Result, path: String): Unit = {
    import spark.implicits._
    val sourceId = math.abs(sourceLocator.hashCode.toLong)

    val edges = result.edges.map { case (tgt, e) =>
      (sourceId, tgt, e.outColumn, e.parentSchema, e.parentTable,
        e.parentColumn, e.context)
    }.toDF("sql_source_id", "target", "out_column", "parent_schema",
        "parent_table", "parent_column", "usage_context")
      .withColumn("id", idOf(col("sql_source_id"), col("target"),
        col("out_column"), col("parent_schema"), col("parent_table"),
        col("parent_column"), col("usage_context")))
      .dropDuplicates("id")

    val inserts = result.inserts.map(t => (sourceId, t.dbSchema, t.dbTable, t.insertType))
      .toDF("sql_source_id", "db_schema", "db_table", "type")

    val datasets = result.datasets.map(d =>
      (sourceId, d.name, d.dsType, d.schema, d.table, d.isAggregated, d.storageLoc))
      .toDF("sql_source_id", "defined_name", "type", "map_to_schema",
        "map_to_table", "is_aggregated", "storage_loc")
      .dropDuplicates()

    // ALTER TABLE ADD PARTITION events (reference table_add_partition,
    // LineageDbService.recordAlter :242-258; INSERT IGNORE → content id +
    // dropDuplicates).
    val addParts = result.addPartitions.map(p =>
      (sourceId, p.dbSchema, p.dbTable, p.location))
      .toDF("sql_source_id", "db_schema", "db_table", "location")
      .withColumn("id", idOf(col("sql_source_id"), col("db_schema"),
        col("db_table"), col("location")))
      .dropDuplicates("id")

    val items = result.items.map { case (tgt, it) =>
      (sourceId, tgt, it.name, it.definition, it.alias, it.usageContext,
        it.isSimpleColumn, it.dataType, it.functionType,
        it.mapToSchema, it.mapToTable, it.mapToColumn, it.datasetType)
    }.toDF("sql_source_id", "target", "name", "definition", "alias",
        "usage_context", "is_simple_column", "data_type", "function_type",
        "map_to_schema", "map_to_table", "map_to_column", "ds_type")
      .withColumn("id", idOf(col("sql_source_id"), col("target"), col("name"),
        col("definition"), col("usage_context"), col("ds_type")))
      .dropDuplicates("id")

    val source = Seq((sourceId, sourceLocator, "SPARK"))
      .toDF("id", "source_locator", "sql_dialect")

    source.write.mode(SaveMode.Overwrite).parquet(s"$path/sql_source")
    addParts.write.mode(SaveMode.Overwrite).parquet(s"$path/table_add_partition")
    datasets.write.mode(SaveMode.Overwrite).parquet(s"$path/dataset")
    edges.write.mode(SaveMode.Overwrite).parquet(s"$path/select_item_rel")
    inserts.write.mode(SaveMode.Overwrite).parquet(s"$path/table_insert")
    items.write.mode(SaveMode.Overwrite).parquet(s"$path/select_item")
  }

  def readEdges(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/select_item_rel")

  def readItems(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/select_item")
}
