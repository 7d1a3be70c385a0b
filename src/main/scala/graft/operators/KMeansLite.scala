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
  *    means are computed as exact integer sums of 2^30-quantized values
  *    before one double multiply + divide — addition order can't change
  *    the result, and (unlike a double->decimal cast, whose rounding is
  *    engine-specific) `round(x * 2^30)` is bit-identical across Spark
  *    and DuckDB, so the whole fit is SQL-replicable by an oracle.
  */
object KMeansLite {

  /** Quantization scale for centroid means: 2^30 (~9.3e-10 granularity,
    * below float input precision for |x| < 0.5). */
  val MeanScale: Double = 1073741824.0

  /** Clamp bound applied BEFORE quantization: 2^32, so the scaled value
    * stays within 2^62 < Long.MaxValue. Without it one corrupt embedding
    * component (e.g. 1e30 from a broken upstream writer) overflows the
    * BIGINT cast and kills the whole fit — found by the adversarial
    * embeddings corpus. The clamp is a plain double min/max, identical
    * on both engines, and a no-op for every sane embedding. */
  val QClamp: Double = 4294967296.0

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
      // Exact per-(cell, dim) means: integer sums of quantized values are
      // order-independent, so the new centroids are bit-identical run to
      // run (and engine to engine — the q115 oracle replays this).
      val sums = assigned
        .select(col("cell"), posexplode(col(vCol)).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(sum(expr(
          s"CAST(round(least(greatest(x, -$QClamp), $QClamp) * $MeanScale) AS BIGINT)")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val next = Array.tabulate(cents.length)(i => cents(i).clone())
      sums.foreach { r =>
        val (cell, pos) = (r.getInt(0), r.getInt(1))
        next(cell)(pos) = r.getLong(2).toDouble / (r.getLong(3).toDouble * MeanScale)
      }
      cents = next
    }
    cents
  }

  /** Add a `cell` column: argmin squared-L2 to the broadcast centroids
    * (ties -> lowest cell id), via the codegen'd
    * [[graft.functions.NearestCell]] expression — one primitive-loop
    * distance evaluation per centroid inside WholeStageCodegen (the
    * interpreted `aggregate(zip_with(...))` HOF argmin it replaces
    * evaluated each distance fold twice per centroid). No shuffle. */
  def assign(df: DataFrame, vCol: String, cents: Array[Array[Double]]): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    df.withColumn("cell", Bridge.column(
      graft.functions.NearestCell(Bridge.expr(col(vCol)), cents)))
  }
}
