package graft.operators

import graft.{Q, Tables}
import graft.plans.AsOfJoinApi
import org.apache.spark.sql.functions._

/** As-of join over the events table: align each purchase with the most
  * recent prior click by the same user — the event-time feature-alignment
  * pattern of training-data pipelines. The oracle is DuckDB's native
  * ASOF LEFT JOIN (timestamps truncated to microseconds on the DuckDB
  * side to match Spark's timestamp precision).
  */
object AsOfOps {

  private val q91 = Q(
    "q91_asof_join",
    """WITH p AS (SELECT event_id, user_id, date_trunc('microseconds', ts) AS ts
      |           FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT event_id, user_id, date_trunc('microseconds', ts) AS ts
      |      FROM events WHERE event_type = 'click')
      |SELECT p.event_id, p.user_id, c.event_id AS click_id,
      |  CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
    val ev = Tables.load(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
    AsOfJoinApi.asofJoin(purchases, clicks,
        leftKey = "user_id", rightKey = "c_user",
        leftTime = "ts", rightTime = "click_ts")
      .select(col("event_id"), col("user_id"), col("click_id"),
        (unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("gap_us"))
      .orderBy("event_id")
  }

  val defs: Seq[Q] = Seq(q91)
}
