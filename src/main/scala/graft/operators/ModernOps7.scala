package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-9 surfaces, part 7 — lakehouse table maintenance:
  *
  *  - q309 incremental materialized-view maintenance: a new fact
  *    partition lands and the q304-style pre-aggregate is brought
  *    current by folding the DELTA's partials into the stored
  *    partials — maintenance cost ∝ delta, never the full fact scan
  *    (the other half of making q304's rewrite deployable);
  *  - q310 merge-on-read EQUALITY deletes: the GDPR-shaped delete —
  *    a small file of key VALUES (not positions, q280's variant), the
  *    reader broadcast-anti-joins the scan against it. Deleting a
  *    customer from 100 TB costs one broadcast, zero rewrites.
  */
object ModernOps7 {

  // ------------- q309: incremental MV maintenance

  private val MvCutoff = "1997-01-01"

  /** Incremental maintenance of the (returnflag × ship-day) pre-agg:
    * build the MV from the pre-cutoff fact history, then bring it
    * current with the post-cutoff DELTA by unioning the stored
    * partials with the delta's partials and re-aggregating — sum and
    * count are self-decomposable, so the refreshed MV is byte-equal to
    * a full rebuild while touching only O(delta) fact rows + O(MV)
    * stored rows. The emitted rollup reads ONLY the refreshed MV; the
    * oracle aggregates the whole base table — any maintenance error
    * (lost group, double-counted partial) goes hash-red. */
  private val q309 = Q(
    "q309_mv_incremental_refresh",
    """SELECT l_returnflag,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR)
      |    AS revenue,
      |  CAST(count(*) AS BIGINT) AS n_items
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val mvPath = java.nio.file.Files
      .createTempDirectory("graft_q309_mv").toString
    def partials(df: DataFrame): DataFrame = df
      .groupBy(col("l_returnflag"), to_date(col("l_shipdate")).as("ship_day"))
      .agg(
        sum(col("l_extendedprice").cast(DecimalType(12, 2))).as("sum_price"),
        count(lit(1)).as("cnt"))
    val fact = Tables.load(s, dir, "lineitem")
    val cutoff = lit(MvCutoff).cast("timestamp")
    // initial build: history only
    partials(fact.filter(col("l_shipdate") < cutoff))
      .write.mode("overwrite").parquet(mvPath)
    // the delta lands: fold its partials into the stored partials
    // (NULL shipdates ride with the delta — `< cutoff` is NULL for
    // them, so they would otherwise vanish from BOTH sides)
    val refreshed = s.read.parquet(mvPath)
      .unionByName(partials(fact.filter(
        col("l_shipdate") >= cutoff || col("l_shipdate").isNull)))
      .groupBy("l_returnflag", "ship_day")
      .agg(sum("sum_price").cast(DecimalType(22, 2)).as("sum_price"),
        sum("cnt").as("cnt"))
    val mvPath2 = mvPath + "_v2"
    refreshed.write.mode("overwrite").parquet(mvPath2)
    // the rollup reads ONLY the refreshed MV
    s.read.parquet(mvPath2)
      .groupBy("l_returnflag")
      .agg(sum("sum_price").cast(DecimalType(22, 2)).cast("string")
        .as("revenue"),
        sum("cnt").cast("long").as("n_items"))
      .orderBy("l_returnflag")
  }

  // ------------- q310: merge-on-read equality deletes

  /** Equality-delete reader: the delete file holds KEY VALUES (every
    * o_custkey ≡ 5 mod 97 — the erasure request), base files stay
    * immutable, and the live view is scan ⟕̸ deletes on the VALUE
    * column. The delete set is keys (not row positions), so it applies
    * to every base file past and future — the property that makes
    * equality deletes the GDPR tool — and it broadcasts (delete sets
    * are small by nature). NULL custkeys survive: a NULL never equals
    * a delete key, and the oracle spells that explicitly. */
  private val q310 = Q(
    "q310_mor_equality_deletes",
    """SELECT CAST(count(*) AS BIGINT) AS n_live,
      |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR)
      |    AS sum_price
      |FROM orders
      |WHERE o_custkey IS NULL OR o_custkey % 97 <> 5""".stripMargin) { (s, dir) =>
    val base = java.nio.file.Files
      .createTempDirectory("graft_q310_base").toString
    val delPath = java.nio.file.Files
      .createTempDirectory("graft_q310_del").toString
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .write.mode("overwrite").parquet(base)
    def scan = s.read.parquet(base)
    // the DELETE: write only the equality keys
    scan.filter(col("o_custkey") % 97 === 5)
      .select(col("o_custkey").as("del_key")).distinct()
      .write.mode("overwrite").parquet(delPath)
    val dels = s.read.parquet(delPath)
    scan.join(broadcast(dels), col("o_custkey") === col("del_key"),
        "left_anti")
      .agg(count(lit(1)).as("n_live"),
        countDistinct(col("o_custkey")).as("n_customers"),
        sum(col("o_totalprice").cast(DecimalType(12, 2))).cast("string")
          .as("sum_price"))
  }

  val defs: Seq[Q] = Seq(q309, q310)
}
