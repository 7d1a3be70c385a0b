package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Round-8 modern-SQL dialect surfaces: `GROUP BY ALL` / `ORDER BY ALL`
  * with `LIMIT ... OFFSET`, and lateral column aliases. Both compile to
  * the same Catalyst plans as their explicit spellings (the oracle
  * equality proves value parity), so the ergonomic surface costs
  * nothing at any scale; they're kept as executed queries so the
  * dialect stays covered by the gate.
  */
object Relational4 {

  private val q218 = Q(
    "q218_group_order_all",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS sum_qty
      |FROM lineitem
      |GROUP BY ALL ORDER BY ALL NULLS FIRST LIMIT 4 OFFSET 2""".stripMargin) {
    (s, dir) =>
    // GROUP BY ALL infers the non-aggregate output columns; ORDER BY
    // ALL orders by every output column left-to-right — a total order
    // here because the group keys are unique — which makes the
    // LIMIT/OFFSET page deterministic. The monetary sum ships as a
    // fixed-scale decimal string (q01 pattern). The oracle pins NULLS
    // FIRST: Spark ascending sorts default NULLS FIRST but DuckDB
    // defaults NULLS LAST, and with NULL group keys in play (the
    // adversarial corpus) the OFFSET page would otherwise differ.
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS sum_qty
        |FROM lineitem
        |GROUP BY ALL ORDER BY ALL LIMIT 4 OFFSET 2""".stripMargin)
  }

  /** Shared text: both engines support lateral column aliases, so the
    * oracle runs the IDENTICAL statement — p2 references p and sz
    * references p2 inside one SELECT list; the outer query ships the
    * decimals as strings. */
  private val LateralSql =
    """SELECT o_orderkey, CAST(p AS VARCHAR) AS p, CAST(p2 AS VARCHAR) AS p2, sz
      |FROM (
      |  SELECT o_orderkey,
      |    CAST(o_totalprice AS DECIMAL(12,2)) AS p,
      |    p * 2 AS p2,
      |    CASE WHEN p2 > 300000 THEN 'big' ELSE 'small' END AS sz
      |  FROM orders WHERE o_orderkey <= 100)
      |ORDER BY o_orderkey""".stripMargin

  private val q219 = Q(
    "q219_lateral_alias",
    LateralSql) { (s, dir) =>
    // Lateral column aliases: Catalyst rewrites the intra-SELECT alias
    // references into nested projections — same plan as the explicit
    // spelling, zero scale cost. Spark's only spelling difference from
    // the oracle is STRING vs VARCHAR.
    Tables.registerAll(s, dir)
    s.sql(LateralSql.replace("AS VARCHAR", "AS STRING"))
  }

  /** Null-preserving generator (LATERAL VIEW OUTER): documents with an
    * empty token array must still emit one row with a NULL token —
    * the anti-join-free way to keep "docs with no extractable content"
    * visible through an explode pipeline (a plain explode silently
    * drops them; at 100 TB that's an unaccounted corpus slice). */
  private val q238 = Q(
    "q238_explode_outer",
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
      |  FROM documents WHERE doc_id < 20)
      |SELECT t.doc_id AS doc_id, u.w AS word
      |FROM t LEFT JOIN LATERAL (SELECT unnest(t.ws) AS w) u ON TRUE
      |ORDER BY doc_id, word NULLS FIRST""".stripMargin) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    Tables.load(s, dir, "documents")
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), expr("graft_words(text)").as("ws"))
      .select(col("doc_id"), explode_outer(col("ws")).as("word"))
      .orderBy(col("doc_id"), col("word").asc_nulls_first)
  }

  /** regexp_extract_all over the events props payload: pull every
    * digit run out of semi-structured text in one codegen'd pass —
    * the pattern stays in the RE2/Java-portable subset (the q134
    * rule) so both engines extract identical spans. */
  private val q239 = Q(
    "q239_regexp_extract_all",
    """SELECT event_id,
      |  CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_nums,
      |  array_to_string(regexp_extract_all(props, '[0-9]+'), ',') AS nums
      |FROM events WHERE event_id < 500
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .filter(col("event_id") < 500)
      .select(col("event_id"),
        expr("regexp_extract_all(props, '[0-9]+', 0)").as("xs"))
      .select(col("event_id"),
        size(col("xs")).cast("long").as("n_nums"),
        concat_ws(",", col("xs")).as("nums"))
      .orderBy("event_id")
  }

  /** Typed Dataset cogroup — the per-key two-sided merge a join can't
    * express naturally: each user's view and purchase streams are
    * merged in (ts, event_id) order and folded once, counting
    * view<->purchase alternations (a browsing-pattern signal). The
    * cogroup shuffles each side once on user_id and hands BOTH
    * iterators to one function — no join blow-up for users with many
    * of each; state is one previous-type byte. The oracle replays the
    * fold as a lag window over the unioned stream. */
  private val q240 = Q(
    "q240_cogroup_alternations",
    """WITH vp AS (
      |  SELECT user_id, event_id, event_type,
      |    epoch_us(date_trunc('microseconds', ts)) AS us
      |  FROM events WHERE event_type IN ('view', 'purchase')),
      |o AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY us, event_id) AS ptype
      |  FROM vp)
      |SELECT user_id,
      |  CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT)
      |    AS n_views,
      |  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
      |    AS n_purchases,
      |  CAST(count(CASE WHEN ptype IS NOT NULL AND ptype <> event_type
      |        THEN 1 END) AS BIGINT) AS n_switches
      |FROM o GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
    def side(t: String) = ev.filter(col("event_type") === t)
      .select(col("user_id"), col("event_id"), col("us"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
    val merged = side("view").cogroup(side("purchase")) {
      (uid, vs, ps) =>
        val all = (vs.map(e => (e._3, e._2, "view")) ++
          ps.map(e => (e._3, e._2, "purchase"))).toArray
          .sortBy { case (us, id, _) => (us, id) }
        if (all.isEmpty) Iterator.empty
        else {
          var switches = 0L
          var prev: String = null
          all.foreach { case (_, _, t) =>
            if (prev != null && prev != t) switches += 1
            prev = t
          }
          Iterator.single((uid,
            all.count(_._3 == "view").toLong,
            all.count(_._3 == "purchase").toLong, switches))
        }
    }
    merged.toDF("user_id", "n_views", "n_purchases", "n_switches")
      .orderBy("user_id")
  }

  val defs: Seq[Q] = Seq(q218, q219, q238, q239, q240)
}
