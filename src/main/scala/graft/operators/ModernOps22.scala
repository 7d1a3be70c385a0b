package graft.operators

import graft.{Q, Tables}
import graft.plans.RangeJoinRule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 surfaces, part 22 — the range-join optimizer rule at work:
  *
  *  - q354 burst-window audience: "busy" hours (purchase count ≥ half
  *    the peak hour) merged into maximal runs (gaps-and-islands), then
  *    EVERY event joined into its covering window by pure interval
  *    containment (`sec BETWEEN lo AND hi`, no equi key). Without help
  *    Spark plans that as a nested-loop join — every event × every
  *    window; [[graft.plans.RangeJoinRule]] rewrites it into a bucketed
  *    HASH join (W = 3600 s: one bucket probe per event, one exploded
  *    row per window-hour), which is the shape that survives 100 TB.
  *    The spec pins both the plan swap (no BroadcastNestedLoopJoin)
  *    and result equality against the rule-off nested-loop run.
  */
object ModernOps22 {

  private[graft] def ensureRangeRule(s: SparkSession): Unit =
    if (!s.experimental.extraOptimizations.contains(RangeJoinRule))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ RangeJoinRule

  /** The windows + containment join, built while the caller controls
    * the rule conf — exposed so the spec can inspect both plans. */
  private[graft] def burstFrame(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_type").isNotNull)
      .select(unix_timestamp(col("ts")).as("sec"), col("user_id"),
        col("event_type"))
    val hourly = e.filter(col("event_type") === "purchase")
      .groupBy(expr("sec div 3600").as("hr"))
      .agg(count(lit(1)).as("cnt"))
    val busy = hourly
      .crossJoin(broadcast(hourly.agg(max("cnt").as("mx"))))
      .filter(col("cnt") * 2 >= col("mx"))
      .select("hr")
    val win = busy
      .withColumn("grp", col("hr") - row_number().over(Window.orderBy("hr")))
      .groupBy("grp")
      .agg((min("hr") * 3600).as("lo"), (max("hr") * 3600 + 3599).as("hi"))
      .select("lo", "hi")
    e.join(win, e("sec") >= win("lo") && e("sec") <= win("hi"))
      .groupBy("lo", "hi")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"))
      .select(col("lo").cast("long").as("window_start"),
        col("hi").cast("long").as("window_end"),
        col("n_events").cast("long").as("n_events"),
        col("n_users").cast("long").as("n_users"),
        col("n_purchases").cast("long").as("n_purchases"))
      .orderBy("window_start")
  }

  private val q354 = Q(
    "q354_range_join_rule",
    """WITH e AS (
      |  SELECT epoch_us(ts) // 1000000 AS sec, user_id, event_type
      |  FROM events
      |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
      |    AND event_type IS NOT NULL),
      |hourly AS (
      |  SELECT sec // 3600 AS hr, count(*) AS cnt FROM e
      |  WHERE event_type = 'purchase' GROUP BY 1),
      |busy AS (
      |  SELECT hr FROM hourly
      |  WHERE cnt * 2 >= (SELECT max(cnt) FROM hourly)),
      |isl AS (
      |  SELECT hr, hr - row_number() OVER (ORDER BY hr) AS grp FROM busy),
      |win AS (
      |  SELECT min(hr) * 3600 AS lo, max(hr) * 3600 + 3599 AS hi
      |  FROM isl GROUP BY grp)
      |SELECT CAST(w.lo AS BIGINT) AS window_start,
      |  CAST(w.hi AS BIGINT) AS window_end,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
      |  CAST(sum(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_purchases
      |FROM win w JOIN e ON e.sec >= w.lo AND e.sec <= w.hi
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin) { (s, dir) =>
    ensureRangeRule(s)
    s.conf.set(RangeJoinRule.WidthConf, "3600")
    // materialize INSIDE the conf window: plans finalize at execution
    try burstFrame(s, dir).localCheckpoint()
    finally s.conf.set(RangeJoinRule.WidthConf, "0")
  }

  val defs: Seq[Q] = Seq(q354)
}
