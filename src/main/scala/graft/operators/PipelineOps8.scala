package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-8 pipeline operators, batch 2: end-to-end entity resolution,
  * time-series interpolation, contrastive negative sampling, and
  * robust/standard score normalization.
  *
  * Determinism doctrine (QueryDef.scala): every aggregate that feeds a
  * comparison or a division is staged in exact integer/decimal math;
  * doubles appear only in per-row scalar expressions whose inputs are
  * already bit-identical across engines (IEEE ops on equal inputs are
  * equal), with a final round() to absorb nothing — it documents the
  * contract.
  */
object PipelineOps8 {

  // ------------- q250: entity resolution (block -> match -> cluster)

  /** Edit-distance threshold for a match edge (q168's contract). */
  private val EditMax = 4

  /** End-to-end entity resolution over product names: blocking (the
    * trailing-noun band turns all-pairs into an equi-join), pairwise
    * matching (levenshtein <= 4 inside a band), then exact connected
    * components by min-label propagation run to FIXPOINT (the
    * convergence test is a count aggregate per round — the label table
    * is vertex-sized, never edge-sized), and survivorship: the
    * lexicographically smallest member becomes the entity id.
    *
    * Scale: match edges exist only inside bands, so components are
    * band-bounded and the diameter (= rounds to converge) is tiny;
    * each round is two node-keyed shuffles of a vertex-sized table.
    * The oracle computes the same components with a recursive CTE
    * (min reachable label), so fixpoint equality is checked exactly.
    */
  private val q250 = Q(
    "q250_entity_resolution",
    s"""WITH RECURSIVE names AS (SELECT DISTINCT p_name FROM part),
       |banded AS (SELECT p_name,
       |  (string_split(p_name, ' '))[-1] AS noun FROM names),
       |pairs AS (SELECT a.p_name AS a, b.p_name AS b
       |  FROM banded a JOIN banded b
       |    ON a.noun = b.noun AND a.p_name < b.p_name
       |  WHERE levenshtein(a.p_name, b.p_name) <= $EditMax),
       |edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
       |reach(n, lab) AS (
       |  SELECT p_name, p_name FROM names
       |  UNION
       |  SELECT e.a, r.lab FROM edges e JOIN reach r ON r.n = e.b),
       |comp AS (SELECT n, min(lab) AS entity_id FROM reach GROUP BY n)
       |SELECT entity_id, CAST(count(*) AS BIGINT) AS n_members,
       |  string_agg(n, '|' ORDER BY n) AS members
       |FROM comp GROUP BY entity_id ORDER BY entity_id""".stripMargin) {
    (s, dir) =>
    val names = Tables.load(s, dir, "part").select("p_name").distinct()
      .withColumn("noun", element_at(split(col("p_name"), " "), -1))
    val a = names.select(col("p_name").as("a"), col("noun"))
    val b = names.select(col("p_name").as("b"), col("noun"))
    val pairs = a.join(b, Seq("noun"))
      .filter(col("a") < col("b") &&
        levenshtein(col("a"), col("b")) <= EditMax)
      .select("a", "b")
    val edges = pairs.union(pairs.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    var labels = names.select(col("p_name").as("n"))
      .withColumn("lab", col("n")).localCheckpoint()
    var converged = false
    var rounds = 0
    while (!converged && rounds < 30) {
      val nbrMin = edges
        .join(labels.withColumnRenamed("n", "b"), "b")
        .groupBy(col("a").as("n")).agg(min("lab").as("nbr_lab"))
      val next = labels.join(nbrMin, Seq("n"), "left")
        .select(col("n"),
          least(col("lab"), coalesce(col("nbr_lab"), col("lab"))).as("lab"))
        .localCheckpoint()
      converged = next.withColumnRenamed("lab", "new_lab")
        .join(labels, "n")
        .filter(col("new_lab") =!= col("lab"))
        .isEmpty
      labels = next
      rounds += 1
    }
    labels.groupBy(col("lab").as("entity_id"))
      .agg(count(lit(1)).as("n_members"),
        array_join(sort_array(collect_list(col("n"))), "|").as("members"))
      .orderBy("entity_id")
  }

  // ------------- q251: linear interpolation over daily gaps

  /** Gap-filled per-user daily series with exact linear interpolation:
    * observed days keep their value; missing days between observations
    * get (prev*(nd-d) + next*(d-pd)) div (nd-pd) in integer cents —
    * truncating division, identical in both engines, no float ramp to
    * drift. The day grid spans each user's own [min, max] observed
    * day, so endpoints are always observed and the interpolation is
    * always two-sided.
    *
    * Scale: one aggregation to daily grain, sequence-explode of the
    * per-user span (output-sized, not corpus-sized), two
    * ignore-nulls running windows keyed on user — no self-join per
    * gap day.
    */
  private val q251 = Q(
    "q251_interpolate_daily",
    """WITH daily AS (
      |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 DAY))::DATE AS day
      |  FROM (SELECT user_id, min(day) AS mn, max(day) AS mx
      |        FROM daily GROUP BY 1)),
      |joined AS (
      |  SELECT g.user_id, g.day, d.cents,
      |    last_value(d.cents IGNORE NULLS) OVER w AS pv,
      |    last_value(CASE WHEN d.cents IS NOT NULL THEN g.day END IGNORE NULLS)
      |      OVER w AS pd,
      |    first_value(d.cents IGNORE NULLS) OVER w2 AS nv,
      |    first_value(CASE WHEN d.cents IS NOT NULL THEN g.day END IGNORE NULLS)
      |      OVER w2 AS nd
      |  FROM grid g LEFT JOIN daily d USING (user_id, day)
      |  WINDOW w AS (PARTITION BY user_id ORDER BY g.day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |  w2 AS (PARTITION BY user_id ORDER BY g.day
      |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT user_id, day,
      |  CASE WHEN cents IS NOT NULL THEN cents
      |    ELSE (pv * date_diff('day', day, nd) + nv * date_diff('day', pd, day))
      |         // date_diff('day', pd, nd) END AS cents,
      |  (cents IS NOT NULL) AS observed
      |FROM joined ORDER BY user_id, day""".stripMargin) { (s, dir) =>
    val daily = Tables.load(s, dir, "events")
      .groupBy(col("user_id"), date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    val grid = daily.groupBy("user_id")
      .agg(min("day").as("mn"), max("day").as("mx"))
      .select(col("user_id"),
        explode(sequence(col("mn"), col("mx"))).as("day"))
    val wb = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDay = when(col("cents").isNotNull, col("day"))
    grid.join(daily, Seq("user_id", "day"), "left")
      .withColumn("pv", last("cents", ignoreNulls = true).over(wb))
      .withColumn("pd", last(obsDay, ignoreNulls = true).over(wb))
      .withColumn("nv", first("cents", ignoreNulls = true).over(wf))
      .withColumn("nd", first(obsDay, ignoreNulls = true).over(wf))
      .select(col("user_id"), col("day"),
        when(col("cents").isNotNull, col("cents"))
          .otherwise(expr(
            "(pv * datediff(nd, day) + nv * datediff(day, pd)) div datediff(nd, pd)"))
          .as("cents"),
        col("cents").isNotNull.as("observed"))
      .orderBy("user_id", "day")
  }

  // ------------- q252: deterministic contrastive negative sampling

  /** Negatives per anchor document. */
  private val NegK = 3

  /** Contrastive negative pairs: each anchor doc gets NegK pseudo-random
    * partner docs via a multiplicative-hash ring over the dense id
    * space — deterministic (same pairs every run/engine), uniform-ish,
    * and resolved by a plain equi-join on the computed partner id (the
    * corpus is never cross-joined). Self-pairs step to the next slot. */
  private val q252 = Q(
    "q252_negative_pairs",
    s"""WITH n AS (SELECT count(*) AS nd FROM documents),
       |cand AS (
       |  SELECT d.doc_id AS anchor_id, k.k,
       |    (d.doc_id * 2654435761 + k.k * 7919) % n.nd AS raw
       |  FROM documents d
       |  CROSS JOIN (SELECT unnest(range(1, ${NegK + 1})) AS k) k
       |  CROSS JOIN n),
       |pick AS (
       |  SELECT anchor_id, k,
       |    CASE WHEN raw = anchor_id
       |      THEN (raw + 1) % (SELECT nd FROM n) ELSE raw END AS neg_id
       |  FROM cand)
       |SELECT p.anchor_id, CAST(p.k AS INT) AS k, p.neg_id, d.lang AS neg_lang
       |FROM pick p JOIN documents d ON d.doc_id = p.neg_id
       |ORDER BY anchor_id, k""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    val n = docs.agg(count(lit(1)).as("nd"))
    val cand = docs.select(col("doc_id").as("anchor_id"))
      .crossJoin(broadcast(n))
      .select(col("anchor_id"), col("nd"),
        explode(sequence(lit(1), lit(NegK))).as("k"))
      .withColumn("raw",
        (col("anchor_id") * 2654435761L + col("k") * 7919) % col("nd"))
      .withColumn("neg_id",
        when(col("raw") === col("anchor_id"), (col("raw") + 1) % col("nd"))
          .otherwise(col("raw")))
    cand.join(docs.select(col("doc_id").as("neg_id"), col("lang").as("neg_lang")),
        "neg_id")
      .select(col("anchor_id"), col("k").cast("int").as("k"),
        col("neg_id"), col("neg_lang"))
      .orderBy("anchor_id", "k")
  }

  // ------------- q253: per-group z-score normalization

  /** Standard-score feature scaling per event_type. All aggregates are
    * exact (cents BIGINT sums; the sum of squares staged DECIMAL(38,0)
    * so 100x-scale corpora can't overflow a BIGINT); the only floating
    * point is the final per-row (x*n - S) / sqrt(n*Q - S^2), whose
    * inputs are bit-identical across engines, rounded to 6 decimals.
    * One aggregation pass + a groups-sized broadcast back. */
  private val q253 = Q(
    "q253_zscore_normalize",
    """WITH c AS (SELECT event_id, event_type,
      |    CAST(round(value * 100) AS BIGINT) AS x FROM events),
      |st AS (SELECT event_type, count(*) AS n,
      |    sum(x) AS s, sum(CAST(x AS HUGEINT) * x) AS q
      |  FROM c GROUP BY 1)
      |SELECT c.event_id, c.event_type,
      |  round(CAST(c.x * st.n - st.s AS DOUBLE)
      |    / sqrt(CAST(st.n * st.q - CAST(st.s AS HUGEINT) * st.s AS DOUBLE)),
      |    6) AS z
      |FROM c JOIN st USING (event_type)
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val c = Tables.load(s, dir, "events")
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("x"))
    val st = c.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("s"),
        sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("q"))
    c.join(broadcast(st), "event_type")
      .select(col("event_id"), col("event_type"),
        round(
          (col("x") * col("n") - col("s")).cast("double") /
            sqrt((col("n") * col("q") -
              col("s").cast(DecimalType(38, 0)) * col("s")).cast("double")),
          6).as("z"))
      .orderBy("event_id")
  }

  // ------------- q254: MAD-based robust outlier gate

  /** Median/MAD outlier detection per event_type with exact DISCRETE
    * order statistics (the lower-median ELEMENT at rank (n+1) div 2
    * under the (value, event_id) total order — no interpolated
    * percentile to drift between engines); the outlier test
    * |x - med| > 3 * mad is pure integer comparison. Two ranked passes
    * over the same partitioning + a groups-sized broadcast back. */
  private val q254 = Q(
    "q254_mad_outliers",
    """WITH c AS (SELECT event_id, event_type,
      |    CAST(round(value * 100) AS BIGINT) AS x FROM events),
      |med AS (SELECT event_type, x AS med FROM (
      |  SELECT event_type, x, event_id,
      |    row_number() OVER (PARTITION BY event_type ORDER BY x, event_id) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM c) WHERE rn = (n + 1) // 2),
      |dev AS (SELECT c.event_id, c.event_type, c.x, abs(c.x - m.med) AS d,
      |    m.med FROM c JOIN med m USING (event_type)),
      |mad AS (SELECT event_type, d AS mad FROM (
      |  SELECT event_type, d, event_id,
      |    row_number() OVER (PARTITION BY event_type ORDER BY d, event_id) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM dev) WHERE rn = (n + 1) // 2)
      |SELECT dev.event_type, max(dev.med) AS med_cents,
      |  max(mad.mad) AS mad_cents,
      |  CAST(count(*) FILTER (WHERE dev.d > 3 * mad.mad) AS BIGINT) AS n_outliers,
      |  CAST(count(*) AS BIGINT) AS n_total
      |FROM dev JOIN mad USING (event_type)
      |GROUP BY dev.event_type ORDER BY dev.event_type""".stripMargin) {
    (s, dir) =>
    val c = Tables.load(s, dir, "events")
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("x"))
    def lowerMedian(df: org.apache.spark.sql.DataFrame, v: String,
        out: String): org.apache.spark.sql.DataFrame = {
      val w = Window.partitionBy("event_type").orderBy(col(v), col("event_id"))
      val wc = Window.partitionBy("event_type")
      df.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wc))
        .filter(col("rn") === (col("n") + 1).divide(2).cast("long"))
        .select(col("event_type"), col(v).as(out))
    }
    val med = lowerMedian(c, "x", "med")
    val dev = c.join(broadcast(med), "event_type")
      .withColumn("d", abs(col("x") - col("med")))
    val mad = lowerMedian(dev, "d", "mad")
    dev.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(max("med").as("med_cents"), max("mad").as("mad_cents"),
        count(when(col("d") > lit(3) * col("mad"), 1)).as("n_outliers"),
        count(lit(1)).as("n_total"))
      .orderBy("event_type")
  }

  // ------------- q257: optimizer-rule-accelerated fuzzy match

  /** Same fuzzy-match family as q168/q250, but executed with
    * [[graft.plans.LevenshteinThresholdRule]] attached (via
    * `spark.experimental.extraOptimizations` — the runtime route into
    * a driver-owned session; user-built sessions get it from
    * GraftExtensions). The rule rewrites the `levenshtein <= 3` filter
    * into the banded 3-arg form, O(k*n) instead of O(n*m) per
    * candidate pair — same rows, cheaper hot loop. The oracle (and the
    * ExtensionsSpec equality check) pins that the rewrite is
    * result-invisible. */
  private val q257 = Q(
    "q257_lev_banded_match",
    """WITH names AS (SELECT DISTINCT p_name FROM part),
      |banded AS (SELECT p_name,
      |  (string_split(p_name, ' '))[-1] AS noun FROM names)
      |SELECT a.noun AS noun, CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(sum(levenshtein(a.p_name, b.p_name)) AS BIGINT) AS sum_dist
      |FROM banded a JOIN banded b ON a.noun = b.noun AND a.p_name < b.p_name
      |WHERE levenshtein(a.p_name, b.p_name) <= 3
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    // Attached idempotently and left in place: the rule is
    // semantics-preserving (ExtensionsSpec pins rewritten == plain),
    // so the only session-wide effect is faster fuzzy filters.
    if (!s.experimental.extraOptimizations
        .contains(graft.plans.LevenshteinThresholdRule))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ graft.plans.LevenshteinThresholdRule
    val names = Tables.load(s, dir, "part").select("p_name").distinct()
      .withColumn("noun", element_at(split(col("p_name"), " "), -1))
    val a = names.select(col("p_name").as("na"), col("noun"))
    val b = names.select(col("p_name").as("nb"), col("noun"))
    a.join(b, Seq("noun"))
      .filter(col("na") < col("nb") &&
        levenshtein(col("na"), col("nb")) <= 3)
      .groupBy("noun")
      .agg(count(lit(1)).as("n_pairs"),
        sum(levenshtein(col("na"), col("nb"))).as("sum_dist"))
      .orderBy("noun")
  }

  // ------------- q260: typed Aggregator through the public udaf() API

  /** The public typed-UDAF surface ([[graft.functions.CentsMean]], an
    * `Aggregator` registered via `functions.udaf`) — the third custom
    * aggregation route next to the internal TypedImperativeAggregates.
    * Integer-cents buffer, merge-order-free; the oracle replays the
    * exact finish arithmetic ((sum->double)/100/n, round 4). */
  private val q260 = Q(
    "q260_typed_udaf",
    """SELECT event_type,
      |  round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100
      |        / count(value), 4) AS mean_value,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
    (s, dir) =>
    s.udf.register("graft_cents_mean",
      org.apache.spark.sql.functions.udaf(graft.functions.CentsMean,
        org.apache.spark.sql.Encoders.DOUBLE))
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT event_type, graft_cents_mean(value) AS mean_value,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  // ------------- q261: column lineage of a DataFrame (not SQL text)

  /** Capability beyond the reference (which only parses SQL scripts):
    * column-level lineage extracted from ANY analyzed DataFrame plan —
    * the same LineageWalker fold the SQL path uses, applied to a
    * composed join+filter+aggregate built with the Column API. The
    * oracle freezes the expected edge set (reference context
    * semantics: JOIN/WHERE parents fan out to every output column,
    * SELECT for value-flow refs, group keys flow into aggregates). */
  private val q261 = Q(
    "q261_dataframe_lineage",
    """SELECT * FROM (VALUES
      |  ('l_returnflag', 'main', 'lineitem', 'l_orderkey', 'JOIN'),
      |  ('l_returnflag', 'main', 'lineitem', 'l_returnflag', 'SELECT'),
      |  ('l_returnflag', 'main', 'orders', 'o_orderkey', 'JOIN'),
      |  ('l_returnflag', 'main', 'orders', 'o_orderstatus', 'WHERE'),
      |  ('net_qty', 'main', 'lineitem', 'l_discount', 'SELECT'),
      |  ('net_qty', 'main', 'lineitem', 'l_orderkey', 'JOIN'),
      |  ('net_qty', 'main', 'lineitem', 'l_quantity', 'SELECT'),
      |  ('net_qty', 'main', 'lineitem', 'l_returnflag', 'SELECT'),
      |  ('net_qty', 'main', 'orders', 'o_orderkey', 'JOIN'),
      |  ('net_qty', 'main', 'orders', 'o_orderstatus', 'WHERE')
      |) t(out_column, parent_schema, parent_table, parent_column, context)
      |ORDER BY out_column, parent_table, parent_column, context""".stripMargin) {
    (s, dir) =>
    val li = Tables.load(s, dir, "lineitem")
    val o = Tables.load(s, dir, "orders")
    val df = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity") * (lit(1) - col("l_discount"))).as("net_qty"))
    val edges = graft.lineage.LineageWalker.edgesOf(df.queryExecution.analyzed)
    s.createDataFrame(edges.distinct)
      .select(col("outColumn").as("out_column"),
        col("parentSchema").as("parent_schema"),
        col("parentTable").as("parent_table"),
        col("parentColumn").as("parent_column"),
        col("context"))
      .orderBy("out_column", "parent_table", "parent_column", "context")
  }

  // ------------- q267: contiguous global ids without a global window

  /** Contiguous 0..N-1 id assignment in a prescribed total order
    * ((lang, doc_id) here) — the corpus-id step of a training-data
    * build. The naive row_number() over a global ORDER BY funnels the
    * corpus through ONE partition; this is the scale form:
    * range-repartition on the order keys, sort within partitions,
    * count per partition, prefix-sum the (tiny, partition-count-sized)
    * counts on the driver, broadcast offsets back, and add the local
    * index per partition. Ids depend only on the total order, not on
    * where the sampled range boundaries fall, so the result is
    * deterministic even though repartitionByRange samples. Oracle: the
    * window formulation (equivalent by construction, infeasible shape
    * at scale). */
  private val q267 = Q(
    "q267_contiguous_ids",
    """SELECT CAST(row_number() OVER (ORDER BY lang, doc_id) - 1 AS BIGINT)
      |    AS global_id,
      |  lang, doc_id
      |FROM documents ORDER BY global_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val parts = 8
    val sorted = Tables.load(s, dir, "documents")
      .select(col("lang"), col("doc_id"))
      .repartitionByRange(parts, col("lang"), col("doc_id"))
      .sortWithinPartitions("lang", "doc_id")
      .as[(String, Long)]
      .localCheckpoint() // pin the sampled boundaries: counts and the
                         // assignment pass must see the SAME partitioning
    val counts = sorted.rdd
      .mapPartitionsWithIndex { case (i, it) => Iterator((i, it.size.toLong)) }
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _) // partition-count-sized
    val bc = s.sparkContext.broadcast(offsets)
    sorted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val base = bc.value(pid)
      it.zipWithIndex.map { case ((lang, id), i) => (base + i, lang, id) }
    }.toDF("global_id", "lang", "doc_id")
      .orderBy("global_id")
  }

  // ------------- q271: first/last-touch attribution

  /** Marketing attribution: every purchase attributed to the FIRST and
    * LAST view in its trailing 7-day window — one RANGE-framed window
    * over the user's event-time axis (min/max of view timestamps in
    * the frame; value-based, so same-microsecond ties cannot make the
    * answer depend on row order), no per-purchase self-join. -1 when
    * no view precedes. */
  private val q271 = Q(
    "q271_touch_attribution",
    """WITH e AS (SELECT event_id, user_id, event_type,
      |    epoch_us(date_trunc('microseconds', ts)) AS us FROM events),
      |w AS (SELECT event_id, user_id, event_type, us,
      |    max(CASE WHEN event_type = 'view' THEN us END) OVER win AS lt,
      |    min(CASE WHEN event_type = 'view' THEN us END) OVER win AS ft
      |  FROM e
      |  WINDOW win AS (PARTITION BY user_id ORDER BY us
      |    RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id,
      |  coalesce(lt, -1) AS last_touch_us,
      |  coalesce(ft, -1) AS first_touch_us
      |FROM w WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val SevenDaysUs = 7L * 86400 * 1000000
    val w = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(-SevenDaysUs, 0)
    val viewUs = when(col("event_type") === "view", col("us"))
    Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("lt", max(viewUs).over(w))
      .withColumn("ft", min(viewUs).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        coalesce(col("lt"), lit(-1L)).as("last_touch_us"),
        coalesce(col("ft"), lit(-1L)).as("first_touch_us"))
      .orderBy("event_id")
  }

  // ------------- q274: timezone-shifted reporting windows

  /** Day windows aligned to a non-UTC reporting timezone (UTC+8
    * business day) via window()'s startTime offset — the "daily
    * report in local time" requirement. The aggregation itself stays
    * on the native UTC timestamp axis (one shuffle, no per-row tz
    * conversion); only the window boundaries shift. Oracle: truncate
    * the +8h-shifted axis to days and shift back. */
  private val q274 = Q(
    "q274_tz_day_window",
    """SELECT CAST(epoch_us(date_trunc('day', ts + INTERVAL 8 HOUR)
      |    - INTERVAL 8 HOUR) AS BIGINT) AS win_start_us,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .groupBy(window(col("ts"), "1 day", "1 day", "-8 hours"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double")
          .as("total_value"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("n"), col("total_value"))
      .orderBy("win_start_us")
  }

  // ------------- q275: column lineage of a STREAMING plan

  /** Lineage spans streaming too: the same LineageWalker fold over an
    * analyzed readStream plan (watermark -> filter -> windowed agg),
    * with the streaming source leaf mapped to ("stream", source-type)
    * origins — path-independent, so the frozen oracle holds at any
    * sfDir. The plan is analyzed, never executed. */
  private val q275 = Q(
    "q275_streaming_lineage",
    """SELECT * FROM (VALUES
      |  ('n', 'stream', 'FileSource', 'event_type', 'WHERE'),
      |  ('n', 'stream', 'FileSource', 'ts', 'SELECT'),
      |  ('n', 'stream', 'FileSource', 'ts', 'WHERE'),
      |  ('n', 'stream', 'FileSource', 'user_id', 'SELECT'),
      |  ('total', 'stream', 'FileSource', 'event_type', 'WHERE'),
      |  ('total', 'stream', 'FileSource', 'ts', 'SELECT'),
      |  ('total', 'stream', 'FileSource', 'ts', 'WHERE'),
      |  ('total', 'stream', 'FileSource', 'user_id', 'SELECT'),
      |  ('total', 'stream', 'FileSource', 'value', 'SELECT'),
      |  ('user_id', 'stream', 'FileSource', 'event_type', 'WHERE'),
      |  ('user_id', 'stream', 'FileSource', 'ts', 'WHERE'),
      |  ('user_id', 'stream', 'FileSource', 'user_id', 'SELECT'),
      |  ('window', 'stream', 'FileSource', 'event_type', 'WHERE'),
      |  ('window', 'stream', 'FileSource', 'ts', 'SELECT'),
      |  ('window', 'stream', 'FileSource', 'ts', 'WHERE')
      |) t(out_column, parent_schema, parent_table, parent_column, context)
      |ORDER BY out_column, parent_column, context""".stripMargin) { (s, dir) =>
    val df = graft.Tables.eventsStream(s, dir)
      .withWatermark("ts", "1 hour")
      .filter(col("event_type") === "purchase")
      .groupBy(window(col("ts"), "1 day"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
    val edges = graft.lineage.LineageWalker.edgesOf(df.queryExecution.analyzed)
    s.createDataFrame(edges.distinct)
      .select(col("outColumn").as("out_column"),
        col("parentSchema").as("parent_schema"),
        col("parentTable").as("parent_table"),
        col("parentColumn").as("parent_column"),
        col("context"))
      .orderBy("out_column", "parent_column", "context")
  }

  val defs: Seq[Q] =
    Seq(q250, q251, q252, q253, q254, q257, q260, q261, q267, q271, q274, q275)
}
