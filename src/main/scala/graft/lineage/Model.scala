package graft.lineage

/** Lineage data model, ported from the reference's MySQL schema
  * (reference: sql_lineage/src/main/resources/db_setup_ddl.sql:24-190,
  * persistable/Dataset.java:18-38, persistable/SelectItem.java:10-29).
  * Stored as Datasets of these case classes (parquet-friendly).
  */

/** One column-level lineage edge, flattened to base-table origins.
  *
  * `context` mirrors the reference's SelectSectionType (SELECT/WHERE/JOIN,
  * persistable/SelectSectionType.java:3-7). WHERE/JOIN parents fan out to
  * every output column of the dataset, as in the reference
  * (Dataset.java:214-222). `parentColumn` may be the `$COL_ASTERISK$`
  * proxy for column-less aggregates like count(*)
  * (DatasetPool.java:171-195).
  */
final case class ColumnEdge(
    outColumn: String,
    parentSchema: String,
    parentTable: String,
    parentColumn: String,
    context: String)

/** One select_item row (reference persistable/SelectItem.java:10-29,
  * DDL db_setup_ddl.sql:65-88): per-column `definition` (≤1024 ch),
  * `alias`, `data_type` (propagated only for simple column refs,
  * DatasetPool.java:149-155), `is_simple_column`, and `function_type`
  * (SCALAR/AGGREGATION/WINDOW — derived from the Catalyst expression
  * class; the reference declares the enum but never populates it,
  * FunctionAssesser.java:11-14). WHERE/JOIN predicates are items too,
  * with the whole condition as `definition`. */
final case class SelectItemNode(
    name: String,
    definition: String,
    alias: String,
    usageContext: String,
    isSimpleColumn: Boolean,
    dataType: String,
    functionType: String,
    mapToSchema: String,
    mapToTable: String,
    mapToColumn: String,
    /** Type of the owning dataset: SUBQUERY for query select lists,
      * TABLE for registered physical columns (created tables) — the
      * reference joins select_item to dataset for exactly this
      * distinction (LocalHiveMetaStore.java:35-38). */
    datasetType: String = "SUBQUERY")

/** A dataset node (reference DatasetType: SUBQUERY, CTE, TABLE,
  * LATERAL_VIEW, TEMPORARY_TABLE — persistable/DatasetType.java:3-9).
  *
  * `isAggregated` closes a declared-but-never-set reference field (TODO
  * at SqlMetaDataExtractor.java:942) — trivially known here because the
  * scope's Catalyst subtree either contains an `Aggregate` or it
  * doesn't. `storageLoc` mirrors Dataset.storage_loc
  * (persistable/Dataset.java:18-38), captured from CREATE/ALTER
  * LOCATION clauses. */
final case class DatasetNode(
    name: String,
    dsType: String,
    schema: String,
    table: String,
    isAggregated: Boolean = false,
    storageLoc: String = "")

/** An ALTER TABLE ADD PARTITION event (reference table_add_partition,
  * LineageDbService.recordAlter, LineageDbService.java:242-258): links
  * tables via storage location. */
final case class AddPartitionEvent(
    dbSchema: String,
    dbTable: String,
    location: String)

/** A DROP TABLE event. The reference deletes the job's table_insert
  * rows and remembers the name so a same-script CREATE sees it gone
  * (SqlMetaDataExtractor.java:888-896, droppedTables at :46). */
final case class TableDrop(
    dbSchema: String,
    dbTable: String)

/** A recorded INSERT/CTAS target (reference table_insert,
  * LineageDbService.java:185-198). */
final case class TableInsert(
    dbSchema: String,
    dbTable: String,
    insertType: String)

/** table→table summary edge (reference table_lineage,
  * db_setup_ddl.sql:164-175). */
final case class TableEdge(
    childSchema: String,
    childTable: String,
    parentSchema: String,
    parentTable: String)
