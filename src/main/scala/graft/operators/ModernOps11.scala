package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-9 surfaces, part 11 — optimizer statistics, secondary
  * indexes, and exact similarity joins:
  *
  *  - q319 CBO statistics plumbing: ANALYZE TABLE … FOR ALL COLUMNS
  *    into catalog tables, cost-based optimization + join reorder ON —
  *    the statistics lifecycle (collect → store → plan) that q318
  *    estimated by hand, now through the engine's own path;
  *  - q320 file-level bloom index: a DIY per-file bloom bitmap over a
  *    high-cardinality key, built as one aggregate and used at PLAN
  *    time to prune the file list for point lookups — the secondary-
  *    index pattern zone maps (q299) can't serve (equality on a column
  *    uncorrelated with the sort order);
  *  - q321 PPJoin-style prefix-filtered EXACT similarity join: global
  *    frequency-ordered tokens, prefix tokens index candidate pairs
  *    (recall 1 by the prefix-filter theorem), exact set-Jaccard
  *    verifies — the exact-output scale path next to MinHash's
  *    approximate one (q45).
  */
object ModernOps11 {

  // ------------- q319: CBO statistics plumbing

  /** Run the 3-table star join with catalog statistics present and
    * cost-based optimization on. Exposed for the spec (stats audit). */
  private[graft] def cboFrame(s: SparkSession, dir: String): DataFrame = {
    val loc = java.nio.file.Files
      .createTempDirectory("graft_q319_tbl").toString
    s.sql("CREATE DATABASE IF NOT EXISTS graft_q319")
    for (t <- Seq("customer", "orders", "lineitem")) {
      s.sql(s"DROP TABLE IF EXISTS graft_q319.$t")
      Tables.load(s, dir, t).write
        .option("path", s"$loc/$t").mode("overwrite")
        .saveAsTable(s"graft_q319.$t")
      s.sql(s"ANALYZE TABLE graft_q319.$t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    s.sql(
      """SELECT l.l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS STRING)
        |    AS revenue
        |FROM graft_q319.lineitem l
        |JOIN graft_q319.orders o ON l.l_orderkey = o.o_orderkey
        |JOIN graft_q319.customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_custkey % 50 = 3
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  private[graft] def withCboConfs[T](s: SparkSession)(body: => T): T = {
    val keys = Seq(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true",
      "spark.sql.statistics.histogram.enabled" -> "true")
    val saved = keys.map { case (k, _) => k -> s.conf.getOption(k) }
    keys.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** The ANALYZE → catalog → cost-based-plan pipeline end to end: a
    * selective dimension predicate over a star join, planned with real
    * row counts and column histograms. The values cannot depend on the
    * plan — the oracle is the plain join — but the spec pins that the
    * statistics actually reached the optimizer (rowCount on every
    * relation's stats, plan equality with the statistics-less run). */
  private val q319 = Q(
    "q319_cbo_join_reorder",
    """SELECT l.l_returnflag,
      |  CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS VARCHAR)
      |    AS revenue
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE c.c_custkey % 50 = 3
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    withCboConfs(s) { cboFrame(s, dir).localCheckpoint() }
  }

  // ------------- q320: file-level bloom index for point lookups

  private val BloomBits = 4096
  private val BloomK = 3

  /** The k probe positions of a key in the m-bit bloom (independent
    * multipliers, sign-safe, identical in both engines — though the
    * oracle never needs them: bloom pruning only drops FILES, and the
    * residual equality re-check makes the answer exact regardless). */
  private def bloomPos(key: String, j: Int): String =
    s"CAST((($key % $BloomBits) * ${31 + 2 * j} + $j * 1009) % $BloomBits AS INT)"

  /** Build the per-file bloom index and return (files, keptForKey,
    * prunedScan, key): one aggregate over `_metadata.file_path`
    * collects each file's distinct probe positions (≤ m ints per file
    * — metadata-bounded like q299's zone map); a point lookup keeps
    * only files whose bitmap admits ALL k positions of the key. */
  private[graft] def bloomIndexScan(
      s: SparkSession, dir: String): (Int, Int, DataFrame, Long) = {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_q320_layout").toString
    Tables.load(s, dir, "lineitem")
      .repartitionByRange(8, col("l_shipdate"))
      .sortWithinPartitions("l_shipdate")
      .write.mode("overwrite").parquet(tmp)
    val key = s.read.parquet(tmp)
      .agg(max("l_orderkey")).head().getLong(0)
    val posCols = (0 until BloomK)
      .map(j => expr(bloomPos("l_orderkey", j)))
    val index = s.read.parquet(tmp)
      .filter(col("l_orderkey").isNotNull)
      .select(col("_metadata.file_path").as("fp"),
        explode(array(posCols: _*)).as("pos"))
      .groupBy("fp").agg(collect_set("pos").as("bits"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1).toSet)
    val keyPos = (0 until BloomK)
      .map(j => (((key % BloomBits) * (31 + 2 * j) + j * 1009) % BloomBits)
        .toInt)
    val kept = index.filter { case (_, bits) => keyPos.forall(bits) }
      .map(_._1)
    val scan =
      if (kept.isEmpty) s.read.parquet(tmp)
      else s.read.parquet(kept.toIndexedSeq: _*)
    (index.length, kept.length, scan, key)
  }

  /** Point lookup through the bloom file index: only admitting files
    * are scanned, the equality predicate re-checks every row (bloom
    * false positives cost I/O, never correctness), and the oracle runs
    * the same lookup on the base table. */
  private val q320 = Q(
    "q320_bloom_file_index",
    """SELECT CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |  CAST(l_quantity AS DOUBLE) AS quantity,
      |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) AS price
      |FROM lineitem
      |WHERE l_orderkey = (SELECT max(l_orderkey) FROM lineitem)
      |ORDER BY l_linenumber""".stripMargin) { (s, dir) =>
    val (_, _, scan, key) = bloomIndexScan(s, dir)
    scan.filter(col("l_orderkey") === key)
      .select(col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_quantity").cast("double").as("quantity"),
        col("l_extendedprice").cast(DecimalType(12, 2)).cast("string")
          .as("price"))
      .orderBy("l_linenumber")
  }

  // ------------- q321: PPJoin-style exact similarity join

  // Jaccard threshold 0.95 as the fraction 19/20. The synthetic corpus
  // shares most vocabulary across ALL docs (57% of pairs exceed 0.6),
  // so the near-dup threshold must sit where the output is the
  // near-duplicate set, not half the pair space.
  private val PpTauNum = 19
  private val PpTauDen = 20

  /** Exact set-Jaccard ≥ 0.95 document pairs WITHOUT the all-pairs
    * surface: tokens get a global rarity order (ascending frequency,
    * then token), each doc indexes only its PREFIX — the first
    * L − ceil(0.95·L) + 1 rarest tokens — and candidate pairs must
    * share a prefix token (prefix-filter theorem: recall 1 at the
    * threshold). Rare tokens make small candidate buckets, which is
    * why PPJoin survives web scale where the n² join does not; the
    * exact intersection/union then verifies every candidate. The
    * oracle replays the identical prefix pipeline (linear, sweepable);
    * ModernOps11Spec cross-checks against brute-force all-pairs. */
  private val q321 = Q(
    "q321_ppjoin_exact_similarity",
    s"""WITH toksd AS (
       |  SELECT DISTINCT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |    FROM documents) WHERE w <> ''),
       |rk AS (
       |  SELECT w, row_number() OVER (ORDER BY count(*), w) AS r
       |  FROM toksd GROUP BY w),
       |dt AS (
       |  SELECT doc_id, list(r ORDER BY r) AS rs, count(*) AS n
       |  FROM toksd JOIN rk USING (w) GROUP BY doc_id),
       |pre AS (
       |  SELECT doc_id, unnest(rs[1 : n - (($PpTauNum * n + ${PpTauDen - 1}) // $PpTauDen) + 1])
       |    AS p
       |  FROM dt),
       |cand AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2
       |  FROM pre a JOIN pre b ON a.p = b.p AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |ver AS (
       |  SELECT c.d1, c.d2,
       |    len(list_intersect(a.rs, b.rs)) AS n_inter,
       |    a.n + b.n - len(list_intersect(a.rs, b.rs)) AS n_union
       |  FROM cand c JOIN dt a ON a.doc_id = c.d1
       |  JOIN dt b ON b.doc_id = c.d2)
       |SELECT d1, d2, CAST(n_inter AS BIGINT) AS n_inter,
       |  CAST(n_union AS BIGINT) AS n_union,
       |  CAST(n_inter * 100 // n_union AS BIGINT) AS jacc_pct
       |FROM ver WHERE n_inter * $PpTauDen >= $PpTauNum * n_union
       |ORDER BY d1, d2""".stripMargin) { (s, dir) =>
    val toksd = Tables.load(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct()
    // Global rarity rank over the vocabulary WITHOUT a single-partition
    // window (the vocab is corpus-sized at 100x; ScalableRank keeps the
    // ordering pass range-partitioned).
    val rk = ScalableRank.withRank(
      toksd.groupBy("w").agg(count(lit(1)).as("f")), "r",
      col("f"), col("w"))
      .select("w", "r")
    val dt = toksd.join(rk, "w")
      .groupBy("doc_id")
      .agg(array_sort(collect_list("r")).as("rs"), count(lit(1)).as("n"))
      .localCheckpoint() // reused for prefixes and verification
    val pre = dt.select(col("doc_id"),
      explode(expr(
        s"slice(rs, 1, CAST(n - (($PpTauNum * n + ${PpTauDen - 1}) div $PpTauDen) + 1 AS INT))"))
        .as("p"))
    val cand = pre.as("a")
      .join(pre.as("b"),
        col("a.p") === col("b.p") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    cand
      .join(dt.select(col("doc_id").as("d1"), col("rs").as("rs1"),
        col("n").as("n1")), "d1")
      .join(dt.select(col("doc_id").as("d2"), col("rs").as("rs2"),
        col("n").as("n2")), "d2")
      .withColumn("n_inter", size(array_intersect(col("rs1"), col("rs2")))
        .cast("long"))
      .withColumn("n_union", (col("n1") + col("n2")).cast("long")
        - col("n_inter"))
      .filter(col("n_inter") * PpTauDen >= col("n_union") * PpTauNum)
      .select(col("d1"), col("d2"), col("n_inter"), col("n_union"),
        expr("n_inter * 100 div n_union").as("jacc_pct"))
      .orderBy("d1", "d2")
  }

  val defs: Seq[Q] = Seq(q319, q320, q321)
}
