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

  /** Persist one script's lineage under `path` (overwrite per source).
    * `system` mirrors the reference's source-system routing: "dashboard"
    * sources additionally record dashboard_dataset consumer links for
    * every top-level SELECT (LineageDbService.java:200-213). */
  def write(spark: SparkSession, sourceLocator: String,
      result: LineageRunner.Result, path: String,
      system: String = "script"): Unit = {
    import spark.implicits._
    // 64-bit content id like every other id in the store (the reference
    // uses one AutoIncrement namespace for all entities; a 32-bit
    // String.hashCode next to 64-bit xxhash ids invited collisions).
    val sourceId = {
      val bytes = sourceLocator.getBytes("UTF-8")
      def h(seed: Int) = org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashUnsafeBytes2(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          bytes.length, seed)
      math.abs((h(42).toLong << 32) | (h(43).toLong & 0xffffffffL))
    }

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

    // Temporary tables leave scope at session close by renaming their
    // mapping (reference closeSession + changeDatasetMapping,
    // SqlMetaDataExtractor.java:79-100: tmp_<name>_<locator>, 127-char
    // cap) — lineage artifacts survive, uniquified per source.
    val locSuffix = sourceLocator.replaceAll("[.\\- ]", "")
    val datasets = result.datasets.map { d =>
      val mapTable =
        if (d.dsType == "TEMPORARY_TABLE")
          s"tmp_${d.table}_$locSuffix".take(127)
        else d.table
      (sourceId, d.name, d.dsType, d.schema, mapTable, d.isAggregated, d.storageLoc)
    }.toDF("sql_source_id", "defined_name", "type", "map_to_schema",
        "map_to_table", "is_aggregated", "storage_loc")
      .dropDuplicates()
      .withColumn("id", idOf(col("sql_source_id"), col("defined_name"),
        col("type"), col("map_to_schema"), col("map_to_table")))

    // Dashboard consumption links: the top-level SELECT datasets ARE the
    // end nodes a dashboard refers to (dashboard_dataset, DDL
    // db_setup_ddl.sql:115-123).
    val dashboardLinks =
      (if (system.equalsIgnoreCase("dashboard")) result.topSelects else Seq.empty)
        .map(n => (sourceId, n))
        .toDF("sql_source_id", "defined_name")
        .join(datasets.select(col("defined_name"), col("id").as("dataset_id")),
          Seq("defined_name"))
        .select("dataset_id", "sql_source_id")

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

    val source = Seq((sourceId, sourceLocator, "SPARK", system))
      .toDF("id", "source_locator", "sql_dialect", "system_source")

    // ONE task/file per entity table (§5 driver, r16 verdict #7): these
    // are metadata-scale rows (a handful per script), but a bare write
    // of a dropDuplicates output fans out over
    // spark.sql.shuffle.partitions — at local[32] that was 32 shuffle
    // tasks + up to 32 output files PER ENTITY per script, pure fixed
    // cost billed to every lineage query. Rows persisted are identical.
    source.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$path/sql_source")
    addParts.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$path/table_add_partition")
    dashboardLinks.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$path/dashboard_dataset")
    datasets.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$path/dataset")
    edges.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$path/select_item_rel")
    inserts.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$path/table_insert")
    items.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$path/select_item")
  }

  def readEdges(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/select_item_rel")

  def readItems(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/select_item")
}
