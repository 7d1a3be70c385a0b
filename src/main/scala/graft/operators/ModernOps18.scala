package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-9 surfaces, part 18 — physical-encoding advice, time-bounded
  * conversion, and cross-group distribution alignment:
  *
  *  - q342 storage-encoding advisor: per column, the statistics a
  *    writer needs to choose an encoding — row count, NDV, the Simpson
  *    concentration index Σnᵢ² (an integer-exact entropy proxy: high
  *    means few dominant values), top-value share — and a threshold
  *    verdict (dict / rle-friendly / plain); the lakehouse layout
  *    advisor as one aggregation pass;
  *  - q343 time-bounded conversion: for every view, did a purchase by
  *    the same user land within the next 30 minutes — a value-based
  *    FOLLOWING window frame (1 us .. 30 min), no per-view self-join;
  *    daily conversion rates in basis points;
  *  - q344 quantile normalization: each language's n_chars
  *    distribution is mapped onto the pooled distribution by rank →
  *    pooled order statistic at the same fraction (k = ⌈r·N/n_g⌉) —
  *    the cross-batch distribution alignment used to de-bias grouped
  *    features; ranks and order statistics are exact integers.
  */
object ModernOps18 {

  // ------------- q342: storage-encoding advisor

  /** One advisor row per analyzed column. Columns are stacked into
    * (col, value-as-string) rows first; NULL values are counted in n
    * but excluded from value stats — identically on both sides. */
  private val q342 = Q(
    "q342_encoding_advisor",
    """WITH src AS (
      |  SELECT CAST(l_returnflag AS VARCHAR) AS v, 'l_returnflag' AS c
      |  FROM lineitem
      |  UNION ALL SELECT CAST(l_linestatus AS VARCHAR), 'l_linestatus'
      |  FROM lineitem
      |  UNION ALL SELECT CAST(l_partkey AS VARCHAR), 'l_partkey'
      |  FROM lineitem
      |  UNION ALL SELECT CAST(CAST(l_quantity AS BIGINT) AS VARCHAR),
      |    'l_quantity'
      |  FROM lineitem WHERE l_quantity = floor(l_quantity)),
      |per AS (
      |  SELECT c, v, count(*) AS nv FROM src
      |  WHERE v IS NOT NULL GROUP BY 1, 2),
      |agg AS (
      |  SELECT c, sum(nv) AS n, count(*) AS ndv,
      |    sum(nv * nv) AS simpson, max(nv) AS top_n
      |  FROM per GROUP BY 1)
      |SELECT c AS col, CAST(n AS BIGINT) AS n, CAST(ndv AS BIGINT) AS ndv,
      |  CAST(simpson AS BIGINT) AS simpson,
      |  CAST(top_n * 10000 // n AS BIGINT) AS top_share_bp,
      |  CASE WHEN ndv * 100 <= n THEN 'dict'
      |    WHEN top_n * 2 >= n THEN 'rle'
      |    ELSE 'plain' END AS verdict
      |FROM agg ORDER BY col""".stripMargin) { (s, dir) =>
    val li = Tables.load(s, dir, "lineitem")
    val src = li.select(col("l_returnflag").cast("string").as("v"),
        lit("l_returnflag").as("c"))
      .unionByName(li.select(col("l_linestatus").cast("string").as("v"),
        lit("l_linestatus").as("c")))
      .unionByName(li.select(col("l_partkey").cast("string").as("v"),
        lit("l_partkey").as("c")))
      .unionByName(li.filter(col("l_quantity") === floor(col("l_quantity")))
        .select(col("l_quantity").cast("long").cast("string").as("v"),
          lit("l_quantity").as("c")))
    val per = src.filter(col("v").isNotNull)
      .groupBy("c", "v").agg(count(lit(1)).as("nv"))
    per.groupBy("c")
      .agg(sum("nv").as("n"), count(lit(1)).as("ndv"),
        sum(col("nv") * col("nv")).as("simpson"), max("nv").as("top_n"))
      .select(col("c").as("col"), col("n").cast("long").as("n"),
        col("ndv").cast("long").as("ndv"),
        col("simpson").cast("long").as("simpson"),
        expr("top_n * 10000 div n").cast("long").as("top_share_bp"),
        when(col("ndv") * 100 <= col("n"), "dict")
          .when(col("top_n") * 2 >= col("n"), "rle")
          .otherwise("plain").as("verdict"))
      .orderBy("col")
  }

  // ------------- q343: time-bounded conversion

  private val ConvWindowUs = 30L * 60 * 1000000 // 30 minutes

  private val q343 = Q(
    "q343_time_bounded_conversion",
    s"""WITH e AS (
       |  SELECT user_id, event_type, epoch_us(ts) AS us,
       |    CAST(ts AS DATE) AS day
       |  FROM events
       |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
       |    AND event_type IS NOT NULL),
       |w AS (
       |  SELECT user_id, event_type, us, day,
       |    min(CASE WHEN event_type = 'purchase' THEN us END) OVER (
       |      PARTITION BY user_id ORDER BY us
       |      RANGE BETWEEN 1 FOLLOWING AND $ConvWindowUs FOLLOWING)
       |      AS next_p_us
       |  FROM e)
       |SELECT day, CAST(count(*) AS BIGINT) AS n_views,
       |  CAST(sum(CASE WHEN next_p_us IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_converted,
       |  CAST(sum(CASE WHEN next_p_us IS NOT NULL THEN 1 ELSE 0 END)
       |    * 10000 // count(*) AS BIGINT) AS conv_bp
       |FROM w WHERE event_type = 'view'
       |GROUP BY day ORDER BY day""".stripMargin) { (s, dir) =>
    val e = Tables.load(s, dir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"), to_date(col("ts")).as("day"))
    val w = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(1, ConvWindowUs)
    e.withColumn("next_p_us",
        min(when(col("event_type") === "purchase", col("us"))).over(w))
      .filter(col("event_type") === "view")
      .groupBy("day")
      .agg(count(lit(1)).as("n_views"),
        sum(when(col("next_p_us").isNotNull, 1L).otherwise(0L))
          .as("n_converted"))
      .select(col("day"), col("n_views").cast("long").as("n_views"),
        col("n_converted").cast("long").as("n_converted"),
        expr("n_converted * 10000 div n_views").cast("long")
          .as("conv_bp"))
      .orderBy("day")
  }

  // ------------- q344: quantile normalization

  private val q344 = Q(
    "q344_quantile_normalization",
    """WITH d AS (
      |  SELECT doc_id, lang, n_chars FROM documents
      |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
      |    AND n_chars IS NOT NULL),
      |gr AS (
      |  SELECT doc_id, lang, n_chars,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY n_chars, doc_id) AS r,
      |    count(*) OVER (PARTITION BY lang) AS ng
      |  FROM d),
      |pooled AS (
      |  SELECT n_chars AS pv,
      |    row_number() OVER (ORDER BY n_chars, doc_id) AS k
      |  FROM d),
      |nn AS (SELECT count(*) AS n FROM d)
      |SELECT g.doc_id, g.lang, CAST(g.n_chars AS BIGINT) AS n_chars,
      |  CAST(g.r AS BIGINT) AS grp_rank,
      |  CAST(p.pv AS BIGINT) AS normalized
      |FROM gr g CROSS JOIN nn
      |JOIN pooled p ON p.k = (g.r * nn.n + g.ng - 1) // g.ng
      |ORDER BY g.doc_id""".stripMargin) { (s, dir) =>
    val d = Tables.load(s, dir, "documents")
      .filter(col("doc_id").isNotNull && col("lang").isNotNull &&
        col("n_chars").isNotNull)
      .select("doc_id", "lang", "n_chars")
    val gr = d
      .withColumn("r", row_number().over(Window.partitionBy("lang")
        .orderBy("n_chars", "doc_id")))
      .withColumn("ng", count(lit(1)).over(Window.partitionBy("lang")))
    // pooled order statistics WITHOUT a global window
    val pooled = ScalableRank.withRank(
      d.select(col("n_chars").as("pv"), col("doc_id").as("pid")),
      "k", col("pv"), col("pid"))
      .select("pv", "k")
    val nn = d.agg(count(lit(1)).as("n"))
    gr.crossJoin(broadcast(nn))
      .withColumn("k", expr("(r * n + ng - 1) div ng"))
      .join(pooled, "k")
      .select(col("doc_id"), col("lang"),
        col("n_chars").cast("long").as("n_chars"),
        col("r").cast("long").as("grp_rank"),
        col("pv").cast("long").as("normalized"))
      .orderBy("doc_id")
  }

  val defs: Seq[Q] = Seq(q342, q343, q344)
}
