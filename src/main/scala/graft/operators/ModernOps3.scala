package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-9 surfaces, part 3 — three storage/optimizer features a
  * 100 TB deployment leans on daily:
  *
  *  - q298 collation-aware grouping and equality (Spark 4 `COLLATE
  *    UTF8_LCASE`) — case-insensitive semantics declared in the TYPE,
  *    so Catalyst plans a normal hash aggregate instead of the
  *    lower()-wrapping that breaks stats and pushdown;
  *  - q299 zone-map file skipping — per-file min/max stats from the
  *    `_metadata` hidden columns prune a range scan down to the files
  *    that can possibly match (the Delta/Iceberg data-skipping pattern,
  *    composable with q290's Hilbert layout);
  *  - q300 runtime bloom-filter join pruning — Spark's
  *    InjectRuntimeFilter builds a bloom filter from the selective
  *    build side and pushes `might_contain` below the probe-side
  *    shuffle, the optimizer-owned equivalent of a manual semi-join
  *    pre-filter.
  *
  * All three return plain oracle-comparable aggregates: the feature
  * under test changes the PLAN (audited in PlanAuditSpec/ModernOps3Spec),
  * never the answer.
  */
object ModernOps3 {

  // ------------- q298: collation-aware grouping (COLLATE UTF8_LCASE)

  /** Case-insensitive grouping via a collated type instead of lower():
    * the inner SELECT manufactures mixed-case keys deterministically
    * (doc_ids ≡ 1 mod 3 are uppercased — mod 3 is coprime to the corpus's source = id mod 20 layout, so every group mixes cases), declares them `COLLATE UTF8_LCASE`,
    * and the outer GROUP BY + the `k = 'SRC1'` predicate both resolve
    * under that collation — no expression wrapping, so the aggregate
    * keys stay simple attributes (column pruning and partial
    * aggregation see a plain column). The emitted key is lower(k):
    * every member of a case-insensitive group lowercases identically,
    * so the output is deterministic even though the group's
    * representative is not. The oracle spells the same query with
    * explicit lower(). NULL sources are filtered on both sides. */
  private val q298 = Q(
    "q298_collated_group",
    """SELECT lower(k) AS source_ci,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  CAST(count_if(lower(k) = 'src1') AS BIGINT) AS n_src1
      |FROM (SELECT CASE WHEN doc_id % 3 = 1 THEN upper(source)
      |             ELSE source END AS k, n_chars
      |      FROM documents WHERE source IS NOT NULL)
      |GROUP BY lower(k) ORDER BY source_ci""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT lower(k) AS source_ci,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(count_if(k = 'SRC1') AS BIGINT) AS n_src1
        |FROM (SELECT CASE WHEN doc_id % 3 = 1 THEN upper(source)
        |             ELSE source END COLLATE UTF8_LCASE AS k, n_chars
        |      FROM documents WHERE source IS NOT NULL)
        |GROUP BY k ORDER BY source_ci""".stripMargin)
  }

  // ------------- q299: zone-map file skipping

  /** Range predicate for q299 — interior to every corpus's shipdate
    * span, so pruning removes files on both ends. */
  private val ZmLo = "1996-01-01"
  private val ZmHi = "1996-07-01"

  /** Lay lineitem out range-partitioned + sorted by l_shipdate, build
    * a zone map (per-file min/max shipdate) from the `_metadata` hidden
    * columns, and return (totalFiles, keptFiles, prunedScan): the scan
    * reads ONLY files whose [min,max] overlaps [ZmLo,ZmHi) and then
    * applies the full residual predicate, so correctness never depends
    * on the pruning. The zone map itself is one row per FILE — at
    * 100 TB that is ~10^5 rows of metadata, the same driver-side
    * footprint Delta/Iceberg planning carries; data rows never
    * collect. Files whose zone-map entries are NULL (all-NULL shipdate)
    * are safely pruned: a NULL shipdate can never satisfy the range
    * predicate. */
  private[graft] def zoneMapScan(
      s: SparkSession, dir: String): (Int, Int, DataFrame) = {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_q299_layout").toString
    Tables.load(s, dir, "lineitem")
      .repartitionByRange(8, col("l_shipdate"))
      .sortWithinPartitions("l_shipdate")
      .write.mode("overwrite").parquet(tmp)
    // min/max travel as ISO strings: lexicographic order == temporal
    // order, and the row codec is identical for TIMESTAMP and
    // TIMESTAMP_NTZ parquet footers (Tables.load normalizes either way).
    val zones = s.read.parquet(tmp)
      .select(col("_metadata.file_path").as("fp"),
        col("l_shipdate").as("d"))
      .groupBy("fp")
      .agg(min("d").cast("string").as("lo"),
        max("d").cast("string").as("hi"))
      .collect() // one row per file: metadata-bounded by design
    val kept = zones.filter { r =>
      !r.isNullAt(1) && !r.isNullAt(2) &&
        r.getString(2) >= ZmLo && r.getString(1) < ZmHi
    }.map(_.getString(0))
    // An empty keep-list can only mean the predicate matches nothing;
    // fall back to the full layout so the plan stays well-formed.
    val scan =
      if (kept.isEmpty) s.read.parquet(tmp)
      else s.read.parquet(kept.toIndexedSeq: _*)
    (zones.length, kept.length, scan)
  }

  /** Zone-map-pruned range aggregate: revenue by return flag over a
    * six-month shipdate window, scanning only the files the zone map
    * admits. The residual filter re-applies the exact predicate, so
    * the pruned plan and a full scan agree row-for-row
    * (ModernOps3Spec pins that, plus that pruning actually skipped
    * files). The oracle runs the predicate over the original table —
    * the layout step cannot lose or duplicate rows without going red. */
  private val q299 = Q(
    "q299_zonemap_skipping",
    s"""SELECT l_returnflag,
       |  CAST(count(*) AS BIGINT) AS n_items,
       |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR)
       |    AS revenue
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '$ZmLo 00:00:00'
       |  AND l_shipdate < TIMESTAMP '$ZmHi 00:00:00'
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val (_, _, scan) = zoneMapScan(s, dir)
    scan
      .filter(col("l_shipdate") >= lit(ZmLo).cast("timestamp") &&
        col("l_shipdate") < lit(ZmHi).cast("timestamp"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast(DecimalType(12, 2)))
          .cast("string").as("revenue"))
      .orderBy("l_returnflag")
  }

  // ------------- q300: runtime bloom-filter join pruning

  /** Build the fact-dim join with runtime bloom filtering active.
    * Exposed so the spec can assert `might_contain` lands in the
    * executed plan while the confs are still set. */
  private[graft] def bloomJoinFrame(
      s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT CAST(year(o.o_orderdate) AS BIGINT) AS yr,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS STRING)
        |    AS revenue
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_totalprice > 490000
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** The q300 conf block: broadcast disabled so the join actually
    * shuffles (at 100 TB a fact-fact join does), bloom injection
    * enabled with the application-side size gate opened for local
    * corpora. Returns the previous values for restore. */
  private[graft] def withBloomConfs[T](s: SparkSession)(body: => T): T = {
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val saved = keys.map { case (k, _) => k -> s.conf.getOption(k) }
    keys.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** Selective-dim fact join under InjectRuntimeFilter: ~2% of orders
    * survive `o_totalprice > 490000`, so the optimizer builds a bloom
    * filter over the surviving orderkeys and pushes
    * `might_contain(l_orderkey)` below lineitem's shuffle — ~98% of
    * the fact side drops BEFORE the exchange, which at 100 TB is the
    * difference between shuffling terabytes and shuffling gigabytes.
    * The frame is materialized via localCheckpoint INSIDE the conf
    * block (plans optimize at execution, so restoring confs first
    * would silently un-inject the filter); the checkpoint holds only
    * the few aggregated rows. The oracle is the plain join — the bloom
    * filter has no false negatives, and its false positives are
    * re-checked by the join itself. */
  private val q300 = Q(
    "q300_bloom_runtime_filter",
    """SELECT CAST(year(o.o_orderdate) AS BIGINT) AS yr,
      |  CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS VARCHAR)
      |    AS revenue
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE o.o_totalprice > 490000
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    withBloomConfs(s) {
      bloomJoinFrame(s, dir).localCheckpoint()
    }.orderBy("yr")
  }

  val defs: Seq[Q] = Seq(q298, q299, q300)
}
