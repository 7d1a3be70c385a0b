package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** q309 incremental MV maintenance and q310 equality deletes. */
class ModernOps7Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q309 incremental refresh equals a full MV rebuild") {
    // the query's own gate proves refreshed-MV rollup == base truth;
    // here pin the stronger invariant: the refreshed PARTIALS equal a
    // from-scratch rebuild group-for-group (no lost/doubled partial)
    val fact = Tables.load(spark, dir, "lineitem")
    def partials(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("l_returnflag"), to_date(col("l_shipdate")).as("ship_day"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(12, 2))).as("sum_price"),
        count(lit(1)).as("cnt"))
    val cutoff = lit("1997-01-01").cast("timestamp")
    val refreshed = partials(fact.filter(col("l_shipdate") < cutoff))
      .unionByName(partials(fact.filter(
        col("l_shipdate") >= cutoff || col("l_shipdate").isNull)))
      .groupBy("l_returnflag", "ship_day")
      .agg(sum("sum_price").cast(DecimalType(22, 2)).as("sum_price"),
        sum("cnt").as("cnt"))
    val rebuilt = partials(fact)
      .select(col("l_returnflag"), col("ship_day"),
        col("sum_price").cast(DecimalType(22, 2)).as("sum_price"), col("cnt"))
    assert(refreshed.exceptAll(rebuilt).isEmpty &&
      rebuilt.exceptAll(refreshed).isEmpty,
      "incrementally refreshed partials must equal a full rebuild")
    // the delta really is small: maintenance reads O(delta) fact rows
    val deltaRows = fact.filter(
      col("l_shipdate") >= cutoff || col("l_shipdate").isNull).count()
    assert(deltaRows < fact.count(),
      "cutoff must split the fact (delta strictly smaller than full)")
  }

  test("q310 equality deletes drop exactly the keyed rows, NULLs survive") {
    val row = SparkEntry.queries("q310_mor_equality_deletes")(spark, dir)
      .head()
    val orders = Tables.load(spark, dir, "orders")
    val total = orders.count()
    val deleted = orders.filter(col("o_custkey") % 97 === 5).count()
    assert(row.getLong(0) === total - deleted,
      "live count must be total minus keyed deletes")
    val nullRows = orders.filter(col("o_custkey").isNull).count()
    // NULL keys never match an equality delete — all of them survive
    // (vacuous on corpora without NULL custkeys; the adversarial gate
    // runs the non-vacuous case)
    assert(row.getLong(0) >= nullRows)
  }
}
