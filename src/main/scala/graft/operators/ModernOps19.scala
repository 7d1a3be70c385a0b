package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Round-9 surfaces, part 19 — sketch-based join estimation, rule
  * quarantine, and dependency validation:
  *
  *  - q345 join-size estimation via Count-Min inner products: the AMS
  *    idea on CM sketches — |A ⋈ B| is estimated by min over hash rows
  *    of Σ_w cmsA[w]·cmsB[w], never an over- into under-estimate
  *    (E[est] ≥ truth, exact when no cross-key collisions) — the
  *    sketch-only planning statistic next to q318's histograms and
  *    q319's catalog stats, reusing q92's cross-engine CMS aggregate;
  *  - q346 data-quality quarantine: every row is scored against a rule
  *    set, failures carry a BITMASK of violated rules (valid rows are
  *    mask 0) — the dead-letter-table split of an ingestion pipeline,
  *    counts + a deterministic exemplar per mask;
  *  - q347 functional-dependency validation: candidate FDs checked by
  *    grouping the determinant and counting groups with >1 distinct
  *    dependent value — Deequ-style constraint mining over mixed
  *    tables, exact counts (NULLs on either side excluded, identically
  *    on both engines).
  */
object ModernOps19 {

  import SketchOps.{Depth, Width, P, cmsA, cmsB}

  private def bucketSql(i: Int, x: String): String =
    s"(CAST(${cmsA(i)} AS BIGINT) * $x + ${cmsB(i)}) % $P % $Width"

  // ------------- q345: CM-sketch join-size estimate

  private val q345 = Q(
    "q345_cms_join_size_estimate",
    { // oracle: per hash row, bucket-count both sides directly and
      // inner-product them; truth from the exact per-key join counts
      val rowsA = (0 until Depth).map { i =>
        s"""SELECT $i AS i, ${bucketSql(i, "l_partkey")} AS bkt,
           |  count(*) AS c
           |FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1, 2"""
          .stripMargin
      }.mkString("\nUNION ALL\n")
      val rowsB = (0 until Depth).map { i =>
        s"""SELECT $i AS i, ${bucketSql(i, "p_partkey")} AS bkt,
           |  count(*) AS c
           |FROM part WHERE p_partkey IS NOT NULL GROUP BY 1, 2"""
          .stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH ca AS ($rowsA), cb AS ($rowsB),
         |ip AS (
         |  SELECT ca.i, sum(ca.c * cb.c) AS est
         |  FROM ca JOIN cb ON ca.i = cb.i AND ca.bkt = cb.bkt
         |  GROUP BY 1),
         |est AS (SELECT min(est) AS est_n FROM ip),
         |tru AS (
         |  SELECT count(*) AS true_n
         |  FROM lineitem JOIN part ON l_partkey = p_partkey)
         |SELECT CAST(tru.true_n AS BIGINT) AS true_n,
         |  CAST(est.est_n AS BIGINT) AS est_n,
         |  CAST((est.est_n - tru.true_n) * 10000 // tru.true_n AS BIGINT)
         |    AS overest_bp
         |FROM tru CROSS JOIN est""".stripMargin
    }) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms",
      exprs => graft.functions.CountMinSketchAgg(
        exprs.head, Depth, Width, cmsA, cmsB, P).toAggregateExpression(),
      "scala_udf")
    // one sketch per side (two tiny 1-row aggregates), inner products
    // via an array-fold — the estimate never touches the join itself
    val ips = (0 until Depth).map { i =>
      s"""aggregate(sequence(0, ${Width - 1}), 0L,
         |  (acc, w) -> acc + ca[w + ${i * Width}] * cb[w + ${i * Width}])"""
        .stripMargin.replace("\n", " ")
    }.mkString("LEAST(", ", ", ")")
    s.sql(
      s"""WITH sa AS (SELECT graft_cms(l_partkey) AS ca FROM lineitem
         |  WHERE l_partkey IS NOT NULL),
         |sb AS (SELECT graft_cms(p_partkey) AS cb FROM part
         |  WHERE p_partkey IS NOT NULL),
         |est AS (SELECT CAST($ips AS BIGINT) AS est_n
         |  FROM sa CROSS JOIN sb),
         |tru AS (SELECT count(*) AS true_n
         |  FROM lineitem JOIN part ON l_partkey = p_partkey)
         |SELECT CAST(tru.true_n AS BIGINT) AS true_n,
         |  CAST(est.est_n AS BIGINT) AS est_n,
         |  CAST((est.est_n - tru.true_n) * 10000 div tru.true_n AS BIGINT)
         |    AS overest_bp
         |FROM tru CROSS JOIN est""".stripMargin)
  }

  // ------------- q346: data-quality quarantine

  private val q346 = Q(
    "q346_quality_quarantine",
    """WITH scored AS (
      |  SELECT event_id,
      |    (CASE WHEN value IS NULL OR value < 0 THEN 1 ELSE 0 END)
      |    + (CASE WHEN event_type IS NULL OR event_type NOT IN
      |        ('click','error','purchase','signup','view')
      |        THEN 2 ELSE 0 END)
      |    + (CASE WHEN ts IS NULL THEN 4 ELSE 0 END)
      |    + (CASE WHEN user_id IS NULL OR user_id < 0 THEN 8 ELSE 0 END)
      |      AS mask
      |  FROM events)
      |SELECT CAST(mask AS BIGINT) AS mask,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(min(event_id) AS BIGINT) AS exemplar_event_id
      |FROM scored GROUP BY mask ORDER BY mask""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .select(col("event_id"),
        (when(col("value").isNull || col("value") < 0, 1).otherwise(0)
          + when(col("event_type").isNull ||
            !col("event_type").isin(
              "click", "error", "purchase", "signup", "view"), 2)
            .otherwise(0)
          + when(col("ts").isNull, 4).otherwise(0)
          + when(col("user_id").isNull || col("user_id") < 0, 8)
            .otherwise(0)).as("mask"))
      .groupBy("mask")
      .agg(count(lit(1)).as("n"), min("event_id").as("exemplar_event_id"))
      .select(col("mask").cast("long").as("mask"),
        col("n").cast("long").as("n"),
        col("exemplar_event_id").cast("long").as("exemplar_event_id"))
      .orderBy("mask")
  }

  // ------------- q347: functional-dependency validation

  private def fdSql(name: String, table: String, lhs: String,
      rhs: String): String =
    s"""SELECT '$name' AS fd,
       |  CAST(count(*) AS BIGINT) AS n_groups,
       |  CAST(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_violating,
       |  CAST(max(ndv) AS BIGINT) AS max_rhs_ndv,
       |  max(ndv) = 1 AS holds
       |FROM (
       |  SELECT $lhs, count(DISTINCT $rhs) AS ndv
       |  FROM $table WHERE $lhs IS NOT NULL AND $rhs IS NOT NULL
       |  GROUP BY $lhs)""".stripMargin

  private val q347 = Q(
    "q347_fd_validation",
    s"""${fdSql("documents.source->lang", "documents", "source", "lang")}
       |UNION ALL
       |${fdSql("nation.key->region", "nation", "n_nationkey",
          "n_regionkey")}
       |UNION ALL
       |${fdSql("events.user->type", "events", "user_id", "event_type")}
       |ORDER BY fd""".stripMargin) { (s, dir) =>
    def fd(name: String, table: String, lhs: String, rhs: String) =
      Tables.load(s, dir, table)
        .filter(col(lhs).isNotNull && col(rhs).isNotNull)
        .groupBy(lhs).agg(countDistinct(rhs).as("ndv"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("ndv") > 1, 1L).otherwise(0L)).as("n_violating"),
          max("ndv").as("max_rhs_ndv"))
        .select(lit(name).as("fd"),
          col("n_groups").cast("long").as("n_groups"),
          col("n_violating").cast("long").as("n_violating"),
          col("max_rhs_ndv").cast("long").as("max_rhs_ndv"),
          (col("max_rhs_ndv") === 1).as("holds"))
    fd("documents.source->lang", "documents", "source", "lang")
      .unionByName(fd("nation.key->region", "nation", "n_nationkey",
        "n_regionkey"))
      .unionByName(fd("events.user->type", "events", "user_id",
        "event_type"))
      .orderBy("fd")
  }

  val defs: Seq[Q] = Seq(q345, q346, q347)
}
