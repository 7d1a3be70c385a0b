package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All queries take an `sfDir` (e.g. /root/testdata/sf0.01) and read one
  * parquet per table. Reads go through `spark.read.parquet` so Catalyst
  * gets native vectorized scans with predicate pushdown + column pruning.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // The events table carries TIMESTAMP(NANOS) parquet timestamps, which
      // Spark's vectorized reader rejects. Read them as raw nanos-since-epoch
      // longs and truncate to Spark's native microsecond timestamps
      // (integer `div`, not `/` — double division loses precision at 1e18).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")

  // Weak keys: memo entries die with their session; reference equality
  // (SparkSession doesn't override equals) avoids the identityHashCode
  // collision the previous String key had.
  private val registered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  /** Register every table as a temp view named after itself, so SQL-surface
    * queries (GROUPING SETS, ordinal GROUP BY, CTEs, LATERAL VIEW...) can
    * run via spark.sql with the same table names the DuckDB oracle sees.
    * Memoized on the session's CURRENT dir — re-reading 10 parquet footers
    * per query was measurable bench overhead, but the memo must track the
    * latest dir, not the set of dirs ever seen: view names are shared, so
    * a set-membership memo left the views pointing at whichever dir
    * registered last (mis-measured alternating-dir runs like ScaleSmoke). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    registered.synchronized {
      if (registered.get(spark) != dir) {
        names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
        registered.put(spark, dir)
      }
    }
}
