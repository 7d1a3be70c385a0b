package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 surfaces, part 29 — resharding economics and class balance:
  *
  *  - q370 consistent-hashing movement report: scaling a 16-shard
  *    layout to 20 shards moves ~19/20 of all keys under `key mod S`
  *    but only ~1/5 under a hash ring — this query measures BOTH
  *    movement fractions exactly. The ring is 4 virtual nodes per
  *    shard at arithmetic (Knuth-multiplicative, double-mod-portable)
  *    positions; each key takes the vnode with the smallest clockwise
  *    distance, argmin encoded as one BIGINT (delta·2²⁰ + nodeId) so a
  *    plain MIN decides it deterministically in both engines. The key
  *    side crosses only the ≤144-row broadcast ring — corpus-linear,
  *    and the movement number is exactly what a 100 TB rebalance pays;
  *  - q371 class rebalancing: every language downsampled to the
  *    minority class size, keeping per class the m docs smallest in a
  *    deterministic pseudo-random (hash, id) order — the training-set
  *    balancer; per class n_before/n_kept plus an id checksum pinning
  *    the exact selection. Rank runs partitioned by class, never a
  *    global window.
  */
object ModernOps29 {

  private val ShardsA = 16
  private val ShardsB = 20
  private val VNodes = 4
  private val M = 4294967296L // 2^32

  // portable 32-bit mix: both engines' % truncate, so the double-mod
  // form is identical on negatives
  private def hashSql(x: String): String =
    s"((($x) * 2654435761) % $M + $M) % $M"

  private def ringRows(shards: Int): Seq[(Int, Int, Long)] =
    for (sh <- 0 until shards; v <- 0 until VNodes) yield {
      val seed = sh.toLong * 1009 + v.toLong * 9176 + 1
      val pos = Math.floorMod(seed * 2654435761L, M)
      (sh, v, pos)
    }

  private def ringCte(name: String, shards: Int): String = {
    val rows = ringRows(shards)
      .map { case (sh, v, p) => s"($sh, ${sh * VNodes + v}, $p)" }
      .mkString(", ")
    s"$name(shard, node_id, pos) AS (SELECT * FROM (VALUES $rows))"
  }

  private def assignSql(ring: String, keys: String): String =
    s"""SELECT k.key,
       |  CAST(min((r.pos - k.hk + $M) % $M * 1048576
       |    + r.node_id) % 1048576 // $VNodes AS BIGINT) AS shard
       |FROM $keys k CROSS JOIN $ring r
       |GROUP BY k.key""".stripMargin

  private val q370 = Q(
    "q370_consistent_hashing",
    s"""WITH ${ringCte("ring_a", ShardsA)},
       |${ringCte("ring_b", ShardsB)},
       |keys AS (
       |  SELECT doc_id AS key, ${hashSql("doc_id")} AS hk
       |  FROM documents WHERE doc_id IS NOT NULL),
       |aa AS (${assignSql("ring_a", "keys")}),
       |bb AS (${assignSql("ring_b", "keys")}),
       |j AS (
       |  SELECT k.key, aa.shard AS sa, bb.shard AS sb,
       |    ((k.key % $ShardsA + $ShardsA) % $ShardsA) AS ma,
       |    ((k.key % $ShardsB + $ShardsB) % $ShardsB) AS mb
       |  FROM keys k JOIN aa ON aa.key = k.key
       |  JOIN bb ON bb.key = k.key)
       |SELECT CAST(count(*) AS BIGINT) AS n_keys,
       |  CAST(sum(CASE WHEN ma <> mb THEN 1 ELSE 0 END) AS BIGINT)
       |    AS moved_mod,
       |  CAST(sum(CASE WHEN sa <> sb THEN 1 ELSE 0 END) AS BIGINT)
       |    AS moved_ring,
       |  CAST(sum(CASE WHEN ma <> mb THEN 1 ELSE 0 END) * 10000
       |    // count(*) AS BIGINT) AS moved_mod_bp,
       |  CAST(sum(CASE WHEN sa <> sb THEN 1 ELSE 0 END) * 10000
       |    // count(*) AS BIGINT) AS moved_ring_bp
       |FROM j""".stripMargin) { (s, dir) =>
    import s.implicits._
    val keys = Tables.load(s, dir, "documents")
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id").as("key"),
        expr(hashSql("doc_id")).as("hk"))
    def assign(shards: Int, out: String): DataFrame = {
      val ring = ringRows(shards)
        .map { case (sh, v, p) => (sh, sh * VNodes + v, p) }
        .toDF("shard", "node_id", "pos")
      keys.crossJoin(broadcast(ring))
        .groupBy("key")
        .agg((min(expr(s"(pos - hk + $M) % $M * 1048576 + node_id"))
          % 1048576 / VNodes).cast("long").as(out))
    }
    keys
      .join(assign(ShardsA, "sa"), "key")
      .join(assign(ShardsB, "sb"), "key")
      .select(col("key"), col("sa"), col("sb"),
        expr(s"(key % $ShardsA + $ShardsA) % $ShardsA").as("ma"),
        expr(s"(key % $ShardsB + $ShardsB) % $ShardsB").as("mb"))
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("ma") =!= col("mb"), 1L).otherwise(0L))
          .as("moved_mod"),
        sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L))
          .as("moved_ring"))
      .select(col("n_keys").cast("long").as("n_keys"),
        col("moved_mod").cast("long").as("moved_mod"),
        col("moved_ring").cast("long").as("moved_ring"),
        expr("moved_mod * 10000 div n_keys").cast("long")
          .as("moved_mod_bp"),
        expr("moved_ring * 10000 div n_keys").cast("long")
          .as("moved_ring_bp"))
  }

  // ------------- q371: class rebalancing to the minority size

  private val q371 = Q(
    "q371_class_rebalance",
    s"""WITH d AS (
       |  SELECT doc_id, lang, ${hashSql("doc_id")} AS h
       |  FROM documents WHERE doc_id IS NOT NULL AND lang IS NOT NULL),
       |m AS (
       |  SELECT min(cnt) AS m FROM (
       |    SELECT count(*) AS cnt FROM d GROUP BY lang)),
       |r AS (
       |  SELECT lang, doc_id,
       |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)
       |      AS rk,
       |    count(*) OVER (PARTITION BY lang) AS n_before
       |  FROM d)
       |SELECT lang, CAST(max(n_before) AS BIGINT) AS n_before,
       |  CAST(sum(CASE WHEN rk <= (SELECT m FROM m) THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN rk <= (SELECT m FROM m)
       |    THEN (doc_id % 1000003 + 1000003) % 1000003 ELSE 0 END)
       |    AS BIGINT) AS kept_checksum
       |FROM r GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val d = Tables.load(s, dir, "documents")
      .filter(col("doc_id").isNotNull && col("lang").isNotNull)
      .select(col("doc_id"), col("lang"),
        expr(hashSql("doc_id")).as("h"))
    val m = d.groupBy("lang").agg(count(lit(1)).as("cnt"))
      .agg(min("cnt").as("m"))
    val w = Window.partitionBy("lang").orderBy("h", "doc_id")
    d.withColumn("rk", row_number().over(w))
      .withColumn("n_before",
        count(lit(1)).over(Window.partitionBy("lang")))
      .crossJoin(broadcast(m))
      .groupBy("lang")
      .agg(max("n_before").as("n_before"),
        sum(when(col("rk") <= col("m"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rk") <= col("m"),
          expr("(doc_id % 1000003 + 1000003) % 1000003")).otherwise(0L))
          .as("kept_checksum"))
      .select(col("lang"), col("n_before").cast("long").as("n_before"),
        col("n_kept").cast("long").as("n_kept"),
        col("kept_checksum").cast("long").as("kept_checksum"))
      .orderBy("lang")
  }

  val defs: Seq[Q] = Seq(q370, q371)
}
