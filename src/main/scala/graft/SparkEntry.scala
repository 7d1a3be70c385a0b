package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the verified operator inventory; each entry has a DuckDB
  * oracle in `oracleSql` unless the operator is not SQL-expressible (then
  * the driver records a rows-only check).
  */
object SparkEntry {

  /** All registered operator/query definitions, in inventory order. */
  def defs: Seq[Q] =
    operators.Relational.defs ++ operators.Relational2.defs ++
      operators.Relational3.defs ++ operators.TextOps.defs ++
      operators.VectorOps.defs ++ operators.LineageQueries.defs ++
      operators.MultimodalOps.defs ++ operators.AsOfOps.defs ++
      operators.SketchOps.defs ++ operators.SourceOps.defs ++
      operators.PipelineOps.defs ++ operators.PipelineOps2.defs ++
      operators.PipelineOps3.defs ++ operators.PipelineOps4.defs ++
      operators.PipelineOps5.defs ++ operators.PipelineOps6.defs ++
      operators.GraphOps.defs ++ operators.GraphOps2.defs ++
      operators.PipelineOps7.defs ++ operators.PipelineOps8.defs ++
      operators.Relational4.defs ++ operators.VectorOps2.defs ++
      operators.AnalyticsOps.defs ++ operators.SqlSurfaceOps.defs ++
      operators.DedupOps.defs ++
      operators.EvalOps.defs ++ operators.TimeSeriesOps.defs ++
      operators.LakehouseOps.defs ++ operators.OptimizerOps.defs ++
      operators.PrivacyOps.defs ++ operators.QualityOps.defs ++
      operators.BiAnalyticsOps.defs ++ operators.CurationOps.defs ++
      operators.TokenizerOps.defs ++
      operators.CorpusOps.defs ++ operators.LayoutOps.defs ++
      streaming.StreamingOps.defs ++ streaming.StreamingOps2.defs ++
      streaming.StreamingOps3.defs ++ streaming.StreamingOps4.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.collect { case Q(n, _, Some(o)) => n -> o }.toMap

  /** Queries whose wall time at bench scale is dominated by FIXED
    * micro-batch / drain choreography (checkpoint setup, AvailableNow
    * restarts), not by data volume — the streaming surface. Emitted in
    * the bench JSON (`fixed_cost_bound`) so ranking tools don't read
    * their setup cost as data-scale work; their state is
    * watermark-bounded, so the per-row cost stays flat at scale. */
  def fixedCostBound: Set[String] =
    (streaming.StreamingOps.defs ++ streaming.StreamingOps2.defs ++
      streaming.StreamingOps3.defs ++ streaming.StreamingOps4.defs)
      .map(_.name).toSet ++
      // non-streaming-package queries whose cost is drain choreography
      // or fixed-size fixtures, not corpus volume
      Set("q393_sink_time_travel", "q397_manifest_stream_tail",
        "q398_manifest_expire", "q401_manifest_compaction",
        "q408_manifest_mor_delete", "q411_manifest_upsert",
        "q412_manifest_change_feed", "q413_manifest_file_skipping",
        "q414_manifest_schema_evolution",
        "q420_incremental_view_maintenance",
        "q422_manifest_stats_aggregate", "q423_manifest_bloom_skipping",
        "q425_time_travel_sql", "q426_string_range_skipping",
        "q430_sql_catalog_dml", "q431_sql_merge_update")
}
