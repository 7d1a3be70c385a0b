package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verified operator: a Spark implementation plus (usually) an ANSI-SQL
  * oracle the driver runs in DuckDB over the same parquet tables.
  *
  * Determinism rules every Q must obey (the driver hash-compares values):
  *  - identical column names on both sides (alias everything);
  *  - a total ORDER BY on both sides (driver may or may not sort rows);
  *  - no order-dependent floating-point aggregation: sums of monetary
  *    doubles go through DECIMAL (exact) and are cast back to DOUBLE at the
  *    end, so Spark's parallel partial aggregation and DuckDB's sequential
  *    fold produce bit-identical results.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))

  /** Rows-only check (no SQL-expressible oracle). */
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
