package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic mini k-means for IVF coarse quantization (the missing
  * "centroid build" half of q49's cell-probe ANN; reference has no
  * equivalent — this is LLM-pipeline surface).
  *
  * Scale shape (100 TB):
  *  - centroids are metadata-sized (k × dim doubles) and live on the
  *    driver between iterations — exactly like production IVF training,
  *    which fits centroids from a SAMPLE and never shuffles the corpus;
  *  - each iteration is one broadcast of the centroid array + one
  *    map-side assignment pass + one partial-aggregated groupBy(cell) —
  *    shuffle volume is k × dim per partition, independent of n;
  *  - determinism: init = the k lowest-id vectors, fixed iteration
  *    count, argmin ties broken by lowest cell id, and per-dimension
  *    means are computed as exact DECIMAL sums before the final double
  *    divide (FP addition order can't change the result).
  */
object KMeansLite {

  /** Fit k centroids over `df(idCol, vCol: array<double>)`. */
  def fit(df: DataFrame, idCol: String, vCol: String, k: Int, iters: Int): Array[Array[Double]] = {
    val spark = df.sparkSession
    val dim = df.select(size(col(vCol))).head().getInt(0)
    var cents: Array[Array[Double]] = df
      .orderBy(col(idCol)).limit(k)
      .select(vCol).collect()
      .map(_.getSeq[Double](0).toArray)
    for (_ <- 0 until iters) {
      val assigned = assign(df, vCol, cents)
      // Exact per-(cell, dim) means: decimal sums are order-independent,
      // so the new centroids are bit-identical run to run.
      val sums = assigned
        .select(col("cell"), posexplode(col(vCol)).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(sum(col("x").cast("decimal(30,15)")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = Array.tabulate(cents.length)(i => cents(i).clone())
      sums.foreach { r =>
        val (cell, pos) = (r.getInt(0), r.getInt(1))
        next(cell)(pos) = (r.getDecimal(2).doubleValue() / r.getLong(3))
      }
      cents = next
    }
    cents
  }

  /** Add a `cell` column: argmin squared-L2 to the broadcast centroids
    * (ties -> lowest cell id). One codegen'd projection, no shuffle. */
  def assign(df: DataFrame, vCol: String, cents: Array[Array[Double]]): DataFrame = {
    val centArr = cents.zipWithIndex
      .map { case (c, i) => s"struct($i AS cid, array(${c.mkString(",")}) AS cv)" }
      .mkString("array(", ",", ")")
    // argmin via aggregate over the centroid array: carry (best_d2, best_cid).
    val cellExpr =
      s"""aggregate($centArr,
         |  struct(CAST('Infinity' AS DOUBLE) AS d2, -1 AS cid),
         |  (best, c) -> CASE WHEN
         |      aggregate(zip_with($vCol, c.cv, (a, b) -> (a - b) * (a - b)),
         |                CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) < best.d2
         |    THEN struct(
         |      aggregate(zip_with($vCol, c.cv, (a, b) -> (a - b) * (a - b)),
         |                CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) AS d2,
         |      c.cid AS cid)
         |    ELSE best END).cid""".stripMargin
    df.withColumn("cell", expr(cellExpr))
  }
}
