package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Product-analytics operators over the events stream plus two join
  * patterns every large warehouse needs: fuzzy (edit-distance) entity
  * matching and the salted shuffle join for skewed keys.
  *
  * Scale design:
  *  - q163 (retention cohorts): the user->cohort map is built by one
  *    groupBy(user_id); the activity join re-uses the same user_id
  *    hash partitioning (AQE exchange reuse), then reduces to a
  *    week x week matrix — output is tiny regardless of input size.
  *  - q164 (funnel): each stage is a min-aggregate per user joined to
  *    the previous stage's timestamps; all three joins share the
  *    user_id key, so the plan is a chain of co-partitioned
  *    shuffle joins, never a cross-user comparison.
  *  - q165 (gap-fill): the day spine comes from sequence() over a
  *    1-row global min/max aggregate — a broadcast-sized dimension
  *    joined to the (already reduced) daily aggregate. No per-row
  *    calendar explode over the fact table.
  *  - q166 (profiling): one aggregate PER COLUMN over a scan pruned
  *    to that column, unioned — total bytes read = just the profiled
  *    columns, and each lone COUNT(DISTINCT) is a plain two-phase
  *    hash agg. A single wide aggregate with N distinct counts plans
  *    an Expand (xN+1 on every scanned row — measured 6x slower at
  *    sf0.1); approx_count_distinct is the one-scan-no-Expand swap
  *    when estimates suffice.
  *  - q168 (fuzzy match): levenshtein is quadratic per pair, so the
  *    candidate space is cut by a banding equi-join (same trailing
  *    token) before any distance evaluation — the q44/q45 shape
  *    applied to entity resolution.
  *  - q169 (salted join): a hot build key makes one reducer take the
  *    whole probe side; salting replicates each build row R ways and
  *    spreads probe rows by a hash salt, turning one straggler into R
  *    even tasks. Exactness is unaffected: every probe row still meets
  *    its matching build row exactly once (same key, same salt).
  */
object AnalyticsOps {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))

  // --------------------- weekly retention cohorts

  private val q163 = Q(
    "q163_retention_cohorts",
    """WITH first_seen AS (
      |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      |  FROM events GROUP BY 1)
      |SELECT f.cohort_week AS cohort_week,
      |  CAST(date_trunc('week', e.ts) AS DATE) AS activity_week,
      |  count(DISTINCT e.user_id) AS active_users
      |FROM events e JOIN first_seen f ON e.user_id = f.user_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    // Cohort = ISO week of a user's first event; the matrix counts how
    // many of each cohort were active in each later week.
    val e = ev(s, dir)
    val first = e.groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort_week"))
    e.join(first, "user_id")
      .groupBy(col("cohort_week"),
        date_trunc("week", col("ts")).cast("date").as("activity_week"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .orderBy("cohort_week", "activity_week")
  }

  // --------------------- ordered conversion funnel

  private val q164 = Q(
    "q164_funnel",
    """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
      |           WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id AS user_id, min(e.ts) AS t2
      |      FROM events e JOIN v ON e.user_id = v.user_id
      |        AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL 24 HOUR
      |      WHERE e.event_type = 'click' GROUP BY 1),
      |p AS (SELECT e.user_id AS user_id, min(e.ts) AS t3
      |      FROM events e JOIN c ON e.user_id = c.user_id
      |        AND e.ts > c.t2 AND e.ts <= c.t2 + INTERVAL 24 HOUR
      |      WHERE e.event_type = 'purchase' GROUP BY 1)
      |SELECT stage, users FROM (
      |  SELECT '1_view' AS stage, count(*) AS users FROM v
      |  UNION ALL SELECT '2_click', count(*) FROM c
      |  UNION ALL SELECT '3_purchase', count(*) FROM p)
      |ORDER BY stage""".stripMargin) { (s, dir) =>
    // Strictly-ordered conversion funnel with a 24-hour window per
    // stage: stage k counts only if it happens AFTER stage k-1 and
    // within the conversion window (timestamp arithmetic is integer
    // microseconds — exact on both engines). Each stage is one
    // min-aggregate + one co-partitioned join on user_id.
    val e = ev(s, dir)
    val win = expr("INTERVAL 24 HOURS")
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("ts") > col("t1") && col("ts") <= col("t1") + win)
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("ts") > col("t2") && col("ts") <= col("t2") + win)
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    def stage(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("users")).select(lit(name).as("stage"), col("users"))
    stage("1_view", v).unionAll(stage("2_click", c))
      .unionAll(stage("3_purchase", p))
      .orderBy("stage")
  }

  // --------------------- calendar gap-fill

  private val q165 = Q(
    "q165_gapfill_daily",
    """WITH bounds AS (SELECT CAST(min(ts) AS DATE) AS d0,
      |                       CAST(max(ts) AS DATE) AS d1 FROM events),
      |days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      |         FROM bounds),
      |actual AS (
      |  SELECT CAST(ts AS DATE) AS day, count(*) AS n,
      |    sum(CAST(value AS DECIMAL(12,2))) AS tv
      |  FROM events WHERE event_type = 'purchase' AND value > 190
      |  GROUP BY 1)
      |SELECT d.day AS day, coalesce(a.n, 0) AS n,
      |  CAST(coalesce(a.tv, 0) AS DOUBLE) AS total_value
      |FROM days d LEFT JOIN actual a ON d.day = a.day
      |ORDER BY day""".stripMargin) { (s, dir) =>
    // Zero-fill missing days: the day spine spans the WHOLE event
    // range (global min/max, a 1-row aggregate), the sparse series is
    // high-value purchases — days with no such purchase emit (0, 0.0)
    // instead of vanishing. Spine join is broadcast-sized by design.
    val e = ev(s, dir)
    val days = e.agg(to_date(min(col("ts"))).as("d0"), to_date(max(col("ts"))).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val actual = e.filter(col("event_type") === "purchase" && col("value") > 190)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).as("tv"))
    days.join(actual, Seq("day"), "left")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("tv"), lit(0)).cast("double").as("total_value"))
      .orderBy("day")
  }

  // --------------------- one-pass column profiling

  /** (name, kind) for the profiled lineitem columns; kind drives the
    * min/max string rendering (numeric -> DECIMAL(20,2), ts -> DATE). */
  private val ProfileCols: Seq[(String, String)] = Seq(
    "l_orderkey" -> "num", "l_quantity" -> "num", "l_extendedprice" -> "num",
    "l_returnflag" -> "str", "l_linestatus" -> "str", "l_shipdate" -> "ts")

  private def renderDuck(c: String, kind: String, fn: String): String = kind match {
    case "num" => s"CAST(CAST($fn($c) AS DECIMAL(20,2)) AS VARCHAR)"
    case "ts"  => s"CAST(CAST($fn($c) AS DATE) AS VARCHAR)"
    case _     => s"$fn($c)"
  }

  private val q166 = Q(
    "q166_column_profile",
    ProfileCols.map { case (c, kind) =>
      s"""SELECT '$c' AS col_name, count(*) - count($c) AS n_null,
         |  count(DISTINCT $c) AS n_distinct,
         |  ${renderDuck(c, kind, "min")} AS min_s,
         |  ${renderDuck(c, kind, "max")} AS max_s
         |FROM lineitem""".stripMargin
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY col_name")) { (s, dir) =>
    // ANALYZE-style profile: null count, exact distinct count, min/max
    // (rendered to engine-agnostic strings) per column. One aggregate
    // PER COLUMN, unioned: each branch's scan is pruned to a single
    // column and its lone COUNT(DISTINCT) plans as a two-phase hash
    // aggregate. (The tempting single wide aggregate with 6 distinct
    // counts plans an Expand that multiplies every scanned row 7x —
    // measured 12s vs <2s at sf0.1 — and only gets worse with table
    // width. Exchange approx_count_distinct for the distincts and the
    // whole profile collapses back to one scan with no Expand.)
    val li = Tables.load(s, dir, "lineitem")
    def render(c: String, kind: String, agg: org.apache.spark.sql.Column) = kind match {
      case "num" => agg.cast(DecimalType(20, 2)).cast("string")
      case "ts"  => agg.cast("date").cast("string")
      case _     => agg
    }
    ProfileCols.map { case (c, kind) =>
      li.select(col(c)).agg(
        (count(lit(1)) - count(col(c))).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        render(c, kind, min(col(c))).as("min_s"),
        render(c, kind, max(col(c))).as("max_s"))
        .select(lit(c).as("col_name"), col("n_null"), col("n_distinct"),
          col("min_s"), col("max_s"))
    }.reduce(_ unionAll _)
      .orderBy("col_name")
  }

  // --------------------- banded fuzzy (edit-distance) matching

  private val q168 = Q(
    "q168_fuzzy_name_match",
    """WITH names AS (SELECT DISTINCT p_name FROM part),
      |banded AS (SELECT p_name,
      |  (string_split(p_name, ' '))[-1] AS noun FROM names)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |  levenshtein(a.p_name, b.p_name) AS dist
      |FROM banded a JOIN banded b
      |  ON a.noun = b.noun AND a.p_name < b.p_name
      |WHERE levenshtein(a.p_name, b.p_name) <= 4
      |ORDER BY name_a, name_b""".stripMargin) { (s, dir) =>
    // Entity resolution: near-identical product names (edit distance
    // <= 4). The banding key (trailing token) turns the quadratic
    // all-pairs comparison into an equi-join; levenshtein runs only on
    // in-band candidates.
    val names = Tables.load(s, dir, "part").select("p_name").distinct()
      .withColumn("noun", element_at(split(col("p_name"), " "), -1))
    val a = names.select(col("p_name").as("name_a"), col("noun"))
    val b = names.select(col("p_name").as("name_b"), col("noun"))
    a.join(b, Seq("noun"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= 4)
      .select("name_a", "name_b", "dist")
      .orderBy("name_a", "name_b")
  }

  // --------------------- salted shuffle join (skew mitigation)

  private val SaltFactor = 8

  private val q169 = Q(
    "q169_salted_skew_join",
    """SELECT p.p_brand AS p_brand, count(*) AS n,
      |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    // Skew-resilient join: the build side (part) is replicated
    // SaltFactor ways, the probe side (lineitem) is spread by a hash
    // salt; the join key becomes (p_partkey, salt) so one hot part key
    // lands on SaltFactor reducers instead of one. The merge hint pins
    // the shuffle-join shape (a broadcast would hide the salting under
    // test-scale data). Result is byte-identical to the unsalted join.
    val li = Tables.load(s, dir, "lineitem")
      .withColumn("salt", pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(SaltFactor)))
    val p = Tables.load(s, dir, "part")
      .withColumn("salt", explode(sequence(lit(0), lit(SaltFactor - 1))))
    li.hint("merge")
      .join(p, li("l_partkey") === p("p_partkey") && li("salt") === p("salt"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("revenue"))
      .orderBy("p_brand")
  }

  // --------------------- gap-based sessionization (batch)

  private val SessionGapMicros = 6L * 3600 * 1000000

  private val q173 = Q(
    "q173_sessionize_gaps",
    s"""WITH o AS (
       |  SELECT user_id, ts, event_id,
       |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       |  FROM events),
       |f AS (SELECT user_id, ts, event_id,
       |  CASE WHEN prev IS NULL
       |         OR epoch_us(ts) - epoch_us(prev) > $SessionGapMicros
       |       THEN 1 ELSE 0 END AS new_s FROM o),
       |g AS (SELECT user_id, ts,
       |  CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
       |    AS session_seq FROM f)
       |SELECT user_id, session_seq, min(ts) AS session_start,
       |  max(ts) AS session_end, count(*) AS n_events
       |FROM g GROUP BY 1, 2 ORDER BY user_id, session_seq""".stripMargin) { (s, dir) =>
    // Gap-based sessions (the batch twin of q72's session_window): a
    // new session starts when the user's inter-event gap exceeds 6 h.
    // One window pass (lag + running sum, both over the same
    // user_id-partitioned sort) + one groupBy — two shuffles on
    // user_id total, AQE reuses the exchange. Gap math is integer
    // microseconds; ties break on event_id.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev(s, dir)
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev")) > SessionGapMicros, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_seq")
  }

  // --------------------- SCD2 dimension build from a changelog

  private val q174 = Q(
    "q174_scd2_dimension",
    """SELECT user_id, event_id AS version_id,
      |  ts AS valid_from,
      |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
      |  value AS attr,
      |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |    AS is_current
      |FROM events WHERE event_type = 'signup'
      |ORDER BY user_id, valid_from, version_id""".stripMargin) { (s, dir) =>
    // Type-2 slowly-changing dimension: each change event opens a
    // validity interval that the NEXT change closes (valid_to = next
    // valid_from, half-open), the last version stays open
    // (valid_to NULL, is_current). One window pass per key — the
    // standard warehouse dimension build, and the interval source an
    // as-of join (q91) would probe. Ties break on event_id.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev(s, dir).filter(col("event_type") === "signup")
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_id").as("version_id"),
        col("ts").as("valid_from"), col("valid_to"),
        col("value").as("attr"), col("valid_to").isNull.as("is_current"))
      .orderBy("user_id", "valid_from", "version_id")
  }

  // --------------------- time-interval RANGE window frame

  private val q175 = Q(
    "q175_trailing_hour_frame",
    """SELECT event_id, user_id, count(*) OVER w AS n_1h,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS v_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts
      |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    // Value-based (time) window frame: each event sees the trailing
    // hour of its user's activity — RANGE over a timestamp sort key,
    // which q23's numeric RANGE frame can't express. Frame membership
    // is value-based, so same-ts peers are included symmetrically and
    // the result is deterministic without an event_id tie-break.
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT event_id, user_id, count(*) OVER w AS n_1h,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS v_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin)
  }

  // --------------------- fixed-bin histogram + cumulative share

  private val q186 = Q(
    "q186_value_histogram",
    """WITH h AS (
      |  SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin, count(*) AS n
      |  FROM events GROUP BY 1),
      |t AS (SELECT sum(n) AS total FROM h)
      |SELECT h.bin AS bin, h.bin * 25 AS bin_lo, h.n AS n,
      |  CAST(sum(h.n) OVER (ORDER BY h.bin) AS BIGINT) AS cum_n,
      |  CAST(h.n AS DOUBLE) / CAST(t.total AS DOUBLE) AS share
      |FROM h CROSS JOIN t ORDER BY bin""".stripMargin) { (s, dir) =>
    // Equal-width histogram with cumulative counts — the distribution
    // profile every numeric quality gate starts from. Bin assignment is
    // floor(x / width) (single correctly-rounded double division, then
    // floor — bit-identical cross-engine); the window runs over the
    // BINNED rows (bin-count sized), never the fact table.
    Tables.registerAll(s, dir)
    s.sql(
      """WITH h AS (
        |  SELECT CAST(floor(value / 25.0D) AS BIGINT) AS bin, count(*) AS n
        |  FROM events GROUP BY 1),
        |t AS (SELECT sum(n) AS total FROM h)
        |SELECT h.bin AS bin, h.bin * 25 AS bin_lo, h.n AS n,
        |  sum(h.n) OVER (ORDER BY h.bin) AS cum_n,
        |  CAST(h.n AS DOUBLE) / CAST(t.total AS DOUBLE) AS share
        |FROM h CROSS JOIN t ORDER BY bin""".stripMargin)
  }

  // --------------------- set-aggregation surface

  private val q187 = Q(
    "q187_collect_set",
    """SELECT event_type,
      |  CAST(len(list_distinct(list(user_id))) AS BIGINT) AS n_users,
      |  array_to_string(list_sort(list_distinct(list(user_id)))[1:5], ',')
      |    AS first_users
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    // collect_set is the one collection aggregate with deterministic
    // CONTENT (a set); emitting it sorted-then-joined keeps the output
    // comparable cross-engine without relying on array encodings.
    // (collect_list's ORDER is execution-dependent — never hash it.)
    ev(s, dir).groupBy("event_type")
      .agg(size(collect_set(col("user_id"))).cast("long").as("n_users"),
        concat_ws(",", slice(sort_array(collect_set(col("user_id"))), 1, 5))
          .as("first_users"))
      .orderBy("event_type")
  }

  // --------------------------- integer-exact PageRank (power iteration)

  /** Iterative graph analytics as repeated joins — the canonical
    * power-iteration-on-Spark shape. The part<->supplier bipartite graph
    * (distinct lineitem pairs, both directions) gets 3 PageRank
    * iterations with damping 0.85, ALL in integer arithmetic: ranks are
    * 1e12-scaled BIGINT mass, per-neighbor contributions use integral
    * division (r div deg), and the damping step is (85 * sum) div 100 —
    * no floating point anywhere, so Spark and DuckDB (3 unrolled CTE
    * levels; recursive terms can't aggregate) agree bit-for-bit at any
    * corpus magnitude.
    *
    * 100 TB design: edges and degrees are computed once and reused by
    * every iteration (persist on a cluster); each iteration is one
    * shuffle — join on src (co-partitioned with deg), aggregate on dst.
    * Iteration count is fixed ahead of time, which is how production
    * PageRank actually runs (convergence checks cost a pass each).
    * Total mass is bounded (~n_nodes * 1e12 ~ 2e15 at sf0.01, far under
    * the 9.2e18 BIGINT cap; DECIMAL(38,0) is the documented swap past
    * ~1e6 nodes at this scaling). */
  private val q192 = Q(
    "q192_pagerank",
    """WITH e AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
      |edges AS (
      |  SELECT 'P' || p AS src, 'S' || s AS dst FROM e
      |  UNION ALL SELECT 'S' || s AS src, 'P' || p AS dst FROM e),
      |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
      |r0 AS (SELECT src AS node, CAST(1000000000000 AS BIGINT) AS r FROM deg),
      |r1 AS (SELECT ed.dst AS node,
      |    CAST(150000000000 + (85 * CAST(sum(r0.r // deg.d) AS BIGINT)) // 100
      |         AS BIGINT) AS r
      |  FROM edges ed JOIN r0 ON r0.node = ed.src JOIN deg ON deg.src = ed.src
      |  GROUP BY 1),
      |r2 AS (SELECT ed.dst AS node,
      |    CAST(150000000000 + (85 * CAST(sum(r1.r // deg.d) AS BIGINT)) // 100
      |         AS BIGINT) AS r
      |  FROM edges ed JOIN r1 ON r1.node = ed.src JOIN deg ON deg.src = ed.src
      |  GROUP BY 1),
      |r3 AS (SELECT ed.dst AS node,
      |    CAST(150000000000 + (85 * CAST(sum(r2.r // deg.d) AS BIGINT)) // 100
      |         AS BIGINT) AS r
      |  FROM edges ed JOIN r2 ON r2.node = ed.src JOIN deg ON deg.src = ed.src
      |  GROUP BY 1)
      |SELECT node, r FROM r3 ORDER BY r DESC, node LIMIT 20""".stripMargin) {
    (s, dir) =>
    val li = Tables.load(s, dir, "lineitem")
    val e = li.select(col("l_partkey").as("p"), col("l_suppkey").as("s")).distinct()
    // Narrow join/shuffle keys (§2.3): the iterations carry the node as
    // a LONG — 'P'||p ↦ 2p, 'S'||s ↦ 2s+1, an injective map (TPC-H keys
    // are non-negative and far below 2^62), so degrees, contributions
    // and integer rank arithmetic are value-identical per node. The
    // string spelling is re-derived only for the FINAL projection/sort
    // (21k rows at sf0.1), not hashed/shuffled through all 3 iterations
    // as a 5-9 char UTF8String.
    val edges = e.select((col("p") * 2).as("src"), (col("s") * 2 + 1).as("dst"))
      .union(e.select((col("s") * 2 + 1).as("src"), (col("p") * 2).as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    // deg is loop-invariant, so the (edges ⋈ deg) join is hoisted out of
    // the power iteration and the result materialized ONCE
    // (localCheckpoint; persist() on a cluster): each iteration is then
    // a single join + aggregation, and the lineitem distinct is no
    // longer re-planned per reference — the executed plan previously
    // carried 17 parquet scans and 12 joins for 3 iterations
    // (plans/r17/q192_pagerank_executed_*). Same rows per iteration by
    // construction: every (src, dst) pair simply carries its src degree.
    val edgesDeg = edges.join(deg, "src").localCheckpoint()
    var r = edgesDeg.select(col("src").as("node")).distinct()
      .withColumn("r", lit(1000000000000L))
    for (_ <- 1 to 3) {
      r = edgesDeg.join(r, edgesDeg("src") === r("node"))
        .select(col("dst"), expr("r div d").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("sc"))
        .select(col("dst").as("node"),
          (lit(150000000000L) + expr("(85 * sc) div 100")).as("r"))
    }
    // rendering matches the oracle's 'P' || p / 'S' || s exactly; the
    // final ORDER BY ties break on the rendered STRING, as declared
    r.select(
        when(col("node") % 2 === 0, concat(lit("P"), expr("node div 2")))
          .otherwise(concat(lit("S"), expr("(node - 1) div 2")))
          .as("node"),
        col("r"))
      .orderBy(col("r").desc, col("node")).limit(20)
  }

  // ------------------- time-weighted integration (irregular telemetry)

  /** Trapezoidal time-weighted integration per user over an IRREGULAR
    * event series — the metrics/telemetry primitive (time-weighted
    * average sensor value, position-weighted exposure) that plain AVG
    * gets wrong when samples aren't equally spaced. Per consecutive
    * pair: (v_i + v_{i+1}) * dt_i with dt in integer microseconds and
    * values as DECIMAL cents — every product and the running sum are
    * EXACT decimals, so the emitted numerator (weighted_sum, twice the
    * integral) and denominator (total_dt_us) are bit-identical across
    * engines at any magnitude; the final ratio is one division the
    * consumer performs (emitting it would reintroduce the q01
    * decimal->double drift class past 2^53).
    *
    * One window sort per user (lead over (us, event_id) — unique
    * event_ids make the order total) plus the final per-user rollup
    * sharing the same partitioning: two user_id shuffles, AQE reuses
    * the exchange. */
  private val q196 = Q(
    "q196_time_weighted",
    """WITH e AS (
      |  SELECT user_id, event_id,
      |    epoch_us(date_trunc('microseconds', ts)) AS us,
      |    CAST(value AS DECIMAL(12,2)) AS v
      |  FROM events),
      |p AS (
      |  SELECT user_id, v, us,
      |    lead(v) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nv,
      |    lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nus
      |  FROM e)
      |SELECT user_id, count(*) AS n_segments,
      |  CAST(sum(nus - us) AS BIGINT) AS total_dt_us,
      |  CAST(CAST(sum((v + nv) * (nus - us)) AS DECIMAL(38,2)) AS VARCHAR)
      |    AS weighted_sum
      |FROM p WHERE nus IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val e = ev(s, dir).select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("us"), dec(col("value")).as("v"))
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    e.withColumn("nv", lead(col("v"), 1).over(w))
      .withColumn("nus", lead(col("us"), 1).over(w))
      .filter(col("nus").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_segments"),
        sum(col("nus") - col("us")).as("total_dt_us"),
        // Fixed-scale string emission (the q01 magnitude-proof pattern):
        // round 5's only driver-gate red row was this column as a raw
        // DECIMAL(38,2) — rows and values matched but the driver's hash
        // canonicalization of the typed decimal diverged. The scale-2
        // string is the one representation both engines and the hash
        // agree on at every magnitude.
        sum((col("v") + col("nv")) * (col("nus") - col("us")))
          .cast(DecimalType(38, 2)).cast("string").as("weighted_sum"))
      .orderBy("user_id")
  }

  // ------------------------- join-skew pre-flight diagnostics

  /** The pre-flight you run before a giant join to decide whether to
    * salt (q169) or split: per-key row counts on BOTH sides, the join
    * output each key will produce (n_left * n_right — the number a
    * single reducer must handle under plain hash partitioning), top-10
    * by that product with a total (product desc, key) order. All
    * integer arithmetic; the heavy work is two map-side-combined
    * groupBys, their join is co-partitioned on the key, and TakeOrdered
    * reduces to 10 rows — nothing corpus-sized crosses the wire after
    * the counts. */
  private val q198 = Q(
    "q198_join_skew_preflight",
    """WITH l AS (SELECT o_custkey AS k, count(*) AS n_orders
      |           FROM orders GROUP BY 1),
      |r AS (SELECT c_custkey AS k, count(*) AS n_cust FROM customer GROUP BY 1)
      |SELECT l.k AS custkey, l.n_orders, r.n_cust,
      |  l.n_orders * r.n_cust AS est_join_rows
      |FROM l JOIN r ON l.k = r.k
      |ORDER BY est_join_rows DESC, custkey LIMIT 10""".stripMargin) { (s, dir) =>
    val l = Tables.load(s, dir, "orders")
      .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n_orders"))
    val r = Tables.load(s, dir, "customer")
      .groupBy(col("c_custkey").as("k")).agg(count(lit(1)).as("n_cust"))
    l.join(r, "k")
      .select(col("k").as("custkey"), col("n_orders"), col("n_cust"),
        (col("n_orders") * col("n_cust")).as("est_join_rows"))
      .orderBy(col("est_join_rows").desc, col("custkey")).limit(10)
  }

  // ------------------- rolling anomaly flags (integer z-score test)

  /** Rolling 3-sigma anomaly detection over each user's event series —
    * with the z-score test algebraically cleared of ALL division and
    * floating point: x is an outlier of its trailing-25 window iff
    * (n*x - S1)^2 > 9 * (n*S2 - S1^2), which is the same inequality as
    * ((x - mean)/stddev)^2 > 9 but in exact integer cents (values pass
    * through DECIMAL(12,2)*100 so the cast is exact). No sqrt, no
    * division, no accumulation-order sensitivity — both engines flag
    * the identical row set at any plausible corpus magnitude: the
    * squares and their sums are staged through 128-bit-capable types
    * (Spark DECIMAL(38,0), DuckDB HUGEINT; internal only, output
    * columns stay BIGINT) because cents^2 and 25*s2 - s1^2 pass 64
    * bits around |value| ~ 3e7 already, where 64-bit arithmetic wraps
    * in one engine and widens/raises in the other. Exact up to
    * |cents| ~ 5e17 (s1^2 hits the 128-bit line). One window sort
    * per user (trailing ROWS frame, O(1) state per row); warmup rows
    * (n < 25) never flag. */
  private val q199 = Q(
    "q199_rolling_anomaly",
    """WITH e AS (
      |  SELECT user_id, event_id,
      |    epoch_us(date_trunc('microseconds', ts)) AS us,
      |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |w AS (
      |  SELECT user_id, event_id, cents,
      |    count(*) OVER win AS n,
      |    sum(CAST(cents AS HUGEINT)) OVER win AS s1,
      |    sum(CAST(cents AS HUGEINT) * cents) OVER win AS s2
      |  FROM e
      |  WINDOW win AS (PARTITION BY user_id ORDER BY us, event_id
      |                 ROWS BETWEEN 24 PRECEDING AND CURRENT ROW))
      |SELECT user_id, event_id, cents
      |FROM w
      |WHERE n = 25
      |  AND (25*CAST(cents AS HUGEINT) - s1)*(25*CAST(cents AS HUGEINT) - s1)
      |      > 9 * (25*s2 - s1*s1)
      |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val e = ev(s, dir).select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("us"),
      (dec(col("value")) * 100).cast("long").as("cents"))
    val win = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(-24, 0)
    // DECIMAL(38,0) staging (Spark side of the HUGEINT swap in the
    // oracle): cents*cents and the quadratic test terms exceed 64 bits
    // well inside plausible magnitudes; internal only, outputs stay
    // BIGINT.
    val c38 = col("cents").cast(DecimalType(38, 0))
    val dev = lit(25) * c38 - col("s1")
    e.withColumn("n", count(lit(1)).over(win))
      .withColumn("s1", sum(c38).over(win))
      .withColumn("s2", sum(c38 * col("cents")).over(win))
      .filter(col("n") === 25 &&
        dev * dev > lit(9) * (lit(25) * col("s2") - col("s1") * col("s1")))
      .select(col("user_id"), col("event_id"), col("cents"))
      .orderBy("user_id", "event_id")
  }

  // ------------------- hierarchical share-of-parent rollup

  /** Ratio-to-report over a hierarchy (nation -> region -> global)
    * computed as windows OVER THE AGGREGATE, not extra scans: one
    * groupBy produces nation totals; region and global totals are
    * window sums over that tiny aggregate (25 rows), so the fact table
    * is read and shuffled exactly once regardless of hierarchy depth.
    * Totals are exact integer cents; the shares themselves are left as
    * numerator/denominator pairs because s_acctbal can be negative and
    * integral division of negatives diverges between engines (Spark
    * `div` truncates toward zero, DuckDB `//` floors) — the consumer
    * divides in whatever rounding mode it wants. */
  private val q201 = Q(
    "q201_share_hierarchy",
    """WITH nt AS (
      |  SELECT n.n_regionkey AS regionkey, s.s_nationkey AS nationkey,
      |    CAST(sum(CAST(CAST(s.s_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT))
      |         AS BIGINT) AS nation_cents
      |  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  GROUP BY 1, 2)
      |SELECT regionkey, nationkey, nation_cents,
      |  CAST(sum(nation_cents) OVER (PARTITION BY regionkey) AS BIGINT)
      |    AS region_cents,
      |  CAST(sum(nation_cents) OVER () AS BIGINT) AS global_cents
      |FROM nt ORDER BY regionkey, nationkey""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val nt = Tables.load(s, dir, "supplier")
      .join(Tables.load(s, dir, "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey").as("regionkey"),
        col("s_nationkey").as("nationkey"))
      .agg(sum((dec(col("s_acctbal")) * 100).cast("long")).as("nation_cents"))
    nt.select(col("regionkey"), col("nationkey"), col("nation_cents"),
        sum(col("nation_cents")).over(Window.partitionBy("regionkey"))
          .as("region_cents"),
        sum(col("nation_cents")).over(Window.partitionBy())
          .as("global_cents"))
      .orderBy("regionkey", "nationkey")
  }

  val defs: Seq[Q] =
    Seq(q163, q164, q165, q166, q168, q169, q173, q174, q175, q186, q187,
      q192, q196, q198, q199, q201)
}
