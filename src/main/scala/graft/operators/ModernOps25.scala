package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-9 surfaces, part 25 — sequence mining, skew forensics, and
  * the optimizer's histogram:
  *
  *  - q359 frequent-sequence mining (PrefixSpan-lite): every event-type
  *    subsequence of length 1–3 (gaps allowed — the sequential-pattern
  *    definition, not q324's one-regex match) counted over (user, day)
  *    sessions. The alphabet is tiny (5 types) so the candidate space
  *    is a closed 155-row broadcast; sessions collapse to their
  *    type-initial string FIRST and identical strings carry a weight,
  *    so the containment scan is (distinct strings × 155) cheap regex
  *    probes, never a corpus blow-up;
  *  - q360 shuffle-skew advisor: per-key count distribution of a join
  *    key (n_keys, max, exact p50/p99 via rank-over-counts), hottest
  *    key, skew ratio in bp (max·n_keys·10⁴/total), and the salting
  *    factor ceil(max/target) a 32-partition shuffle would need — the
  *    pre-flight report you run before a 100 TB join, all from one
  *    count pass over ≤ #keys rows;
  *  - q361 equi-depth histogram: 16 buckets of ~n/B rows each via
  *    ntile in the (cents, key) total order — per bucket n/lo/hi/ndv,
  *    the CBO selectivity statistic (q318's fixed-WIDTH histogram is
  *    the other family). The global order comes from ScalableRank-style
  *    range partitioning, not a single-partition window.
  */
object ModernOps25 {

  // ------------- q359: frequent subsequences (PrefixSpan-lite)

  private val Letters = Seq("c", "e", "p", "s", "v")

  private def candidates: Seq[String] = {
    val l1 = Letters
    val l2 = for (a <- Letters; b <- Letters) yield a + b
    val l3 = for (a <- Letters; b <- Letters; c <- Letters) yield a + b + c
    l1 ++ l2 ++ l3
  }

  private val q359 = Q(
    "q359_frequent_sequences",
    """WITH letters AS (SELECT unnest(['c','e','p','s','v']) AS l),
      |cand AS (
      |  SELECT l AS seq, l AS pat FROM letters
      |  UNION ALL SELECT a.l || b.l, a.l || '.*' || b.l
      |    FROM letters a, letters b
      |  UNION ALL SELECT a.l || b.l || c.l,
      |    a.l || '.*' || b.l || '.*' || c.l
      |    FROM letters a, letters b, letters c),
      |sess AS (
      |  SELECT string_agg(left(event_type, 1), '' ORDER BY ts, event_id)
      |    AS s
      |  FROM events
      |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
      |    AND event_type IS NOT NULL
      |  GROUP BY user_id, CAST(ts AS DATE)),
      |tot AS (SELECT count(*) AS n_sessions FROM sess),
      |hits AS (
      |  SELECT c.seq, count(*) AS support
      |  FROM cand c JOIN sess s ON regexp_matches(s.s, c.pat)
      |  GROUP BY 1)
      |SELECT h.seq, CAST(length(h.seq) AS BIGINT) AS len,
      |  CAST(h.support AS BIGINT) AS support,
      |  CAST(h.support * 10000 // t.n_sessions AS BIGINT) AS support_bp
      |FROM hits h CROSS JOIN tot t
      |ORDER BY h.seq""".stripMargin) { (s, dir) =>
    import s.implicits._
    val sess = Tables.load(s, dir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_type").isNotNull)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("ts"), col("event_id"),
          substring(col("event_type"), 1, 1).as("l")))),
        x => x.getField("l")), "").as("str"))
      // identical strings collapse: the regex scan runs once per
      // distinct session string, weighted by multiplicity
      .groupBy("str").agg(count(lit(1)).as("w"))
    val nSessions = sess.agg(sum("w").as("n_sessions"))
    val cand = candidates.map(c => (c, c.mkString(".*"))).toDF("seq", "pat")
    sess.crossJoin(broadcast(cand))
      .filter(expr("str RLIKE pat"))
      .groupBy("seq")
      .agg(sum("w").as("support"))
      .crossJoin(broadcast(nSessions))
      .select(col("seq"), length(col("seq")).cast("long").as("len"),
        col("support").cast("long").as("support"),
        expr("support * 10000 div n_sessions").cast("long")
          .as("support_bp"))
      .orderBy("seq")
  }

  // ------------- q360: shuffle-skew advisor

  private val SkewPartitions = 32L

  private val q360 = Q(
    "q360_skew_advisor",
    s"""WITH k AS (
       |  SELECT l_suppkey AS key, count(*) AS cnt FROM lineitem
       |  WHERE l_suppkey IS NOT NULL GROUP BY 1),
       |r AS (
       |  SELECT key, cnt,
       |    row_number() OVER (ORDER BY cnt, key) AS rk,
       |    count(*) OVER () AS n_keys, sum(cnt) OVER () AS total
       |  FROM k),
       |hot AS (SELECT key, cnt FROM r ORDER BY cnt DESC, key LIMIT 1),
       |stats AS (
       |  SELECT max(n_keys) AS n_keys, max(total) AS total,
       |    max(cnt) AS max_cnt,
       |    max(CASE WHEN rk = (n_keys + 1) // 2 THEN cnt END) AS p50,
       |    max(CASE WHEN rk = (n_keys * 99 + 99) // 100 THEN cnt END)
       |      AS p99
       |  FROM r)
       |SELECT CAST(s.n_keys AS BIGINT) AS n_keys,
       |  CAST(s.total AS BIGINT) AS n_rows,
       |  CAST(s.max_cnt AS BIGINT) AS max_rows,
       |  CAST(h.key AS BIGINT) AS hottest_key,
       |  CAST(s.p50 AS BIGINT) AS p50,
       |  CAST(s.p99 AS BIGINT) AS p99,
       |  CAST(s.max_cnt * s.n_keys * 10000 // s.total AS BIGINT)
       |    AS skew_bp,
       |  CAST((s.max_cnt + (s.total + $SkewPartitions - 1)
       |      // $SkewPartitions - 1)
       |    // ((s.total + $SkewPartitions - 1) // $SkewPartitions)
       |    AS BIGINT) AS salt_factor
       |FROM stats s CROSS JOIN hot h""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val k = Tables.load(s, dir, "lineitem")
      .filter(col("l_suppkey").isNotNull)
      .groupBy(col("l_suppkey").as("key"))
      .agg(count(lit(1)).as("cnt"))
    // ≤ #keys rows from here on: single-partition windows are fine
    val r = k
      .withColumn("rk", row_number().over(Window.orderBy("cnt", "key")))
      .withColumn("n_keys", count(lit(1)).over(Window.partitionBy()))
      .withColumn("total", sum("cnt").over(Window.partitionBy()))
    val hot = r.orderBy(col("cnt").desc, col("key")).limit(1)
      .select(col("key").as("hottest_key"))
    r.groupBy()
      .agg(max("n_keys").as("n_keys"), max("total").as("total"),
        max("cnt").as("max_cnt"),
        max(when(col("rk") === expr("(n_keys + 1) div 2"), col("cnt")))
          .as("p50"),
        max(when(col("rk") === expr("(n_keys * 99 + 99) div 100"),
          col("cnt"))).as("p99"))
      .crossJoin(hot)
      .select(col("n_keys").cast("long").as("n_keys"),
        col("total").cast("long").as("n_rows"),
        col("max_cnt").cast("long").as("max_rows"),
        col("hottest_key").cast("long").as("hottest_key"),
        col("p50").cast("long").as("p50"),
        col("p99").cast("long").as("p99"),
        expr("max_cnt * n_keys * 10000 div total").cast("long")
          .as("skew_bp"),
        expr(s"(max_cnt + (total + $SkewPartitions - 1)" +
          s" div $SkewPartitions - 1)" +
          s" div ((total + $SkewPartitions - 1) div $SkewPartitions)")
          .cast("long").as("salt_factor"))
  }

  // ------------- q361: equi-depth histogram

  private val Buckets = 16

  private val q361 = Q(
    "q361_equidepth_histogram",
    s"""WITH v AS (
       |  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
       |    AS cents, o_orderkey AS k
       |  FROM orders
       |  WHERE o_totalprice IS NOT NULL AND o_orderkey IS NOT NULL),
       |b AS (
       |  SELECT cents, ntile($Buckets) OVER (ORDER BY cents, k) AS bucket
       |  FROM v)
       |SELECT CAST(bucket AS BIGINT) AS bucket,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(min(cents) AS BIGINT) AS lo,
       |  CAST(max(cents) AS BIGINT) AS hi,
       |  CAST(count(DISTINCT cents) AS BIGINT) AS ndv
       |FROM b GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val v = Tables.load(s, dir, "orders")
      .filter(col("o_totalprice").isNotNull && col("o_orderkey").isNotNull)
      .select((col("o_totalprice").cast(DecimalType(12, 2)) * 100)
        .cast("long").as("cents"), col("o_orderkey").as("k"))
    // global rank without a single-partition window, then the exact
    // ntile allocation: first (n mod B) buckets get ceil(n/B) rows
    val ranked = ScalableRank.withRank(v, "rk", col("cents"), col("k"))
    val n = ranked.count()
    val (q, rem) = (n / Buckets, n % Buckets)
    val bucketExpr = when(col("rk") <= (q + 1) * rem,
      ((col("rk") - 1) / (q + 1)).cast("long") + 1)
      .otherwise(lit(rem) + ((col("rk") - 1 - (q + 1) * rem) / q)
        .cast("long") + 1)
    ranked
      .withColumn("bucket", bucketExpr)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("cents").as("lo"),
        max("cents").as("hi"), countDistinct("cents").as("ndv"))
      .select(col("bucket").cast("long").as("bucket"),
        col("n").cast("long").as("n"), col("lo").cast("long").as("lo"),
        col("hi").cast("long").as("hi"),
        col("ndv").cast("long").as("ndv"))
      .orderBy("bucket")
  }

  val defs: Seq[Q] = Seq(q359, q360, q361)
}
