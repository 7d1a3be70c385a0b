package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (the PUBLIC custom-UDAF API — the third custom
  * aggregation surface next to the internal TypedImperativeAggregates
  * CountMinSketchAgg/TopKAgg): exact mean of a 2-decimal monetary
  * double, accumulated in integer cents so partial buffers merge in
  * any order without float drift; only the single final division is
  * floating point (identical on identical exact inputs in any IEEE
  * engine), rounded to 4 decimals.
  *
  * Registered per-session with `functions.udaf(CentsMean)` /
  * `spark.udf.register` — usable from both the Column API and SQL.
  */
object CentsMean extends Aggregator[java.lang.Double, (Long, Long), java.lang.Double] {
  override def zero: (Long, Long) = (0L, 0L)

  /** Cents via SQL `round` semantics — half AWAY FROM ZERO (DuckDB and
    * Spark `round(v * 100)` both do this), not `math.round`'s half
    * toward +infinity: they differ on negative *.xx5 exact halves
    * (e.g. -1.125 * 100 == -112.5 exactly → -113, where math.round
    * gives -112). Rounds the double PRODUCT (BigDecimal of its exact
    * binary value), mirroring what a SQL engine sees. */
  private def cents(v: Double): Long =
    BigDecimal(v * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  override def reduce(b: (Long, Long), v: java.lang.Double): (Long, Long) =
    if (v == null) b else (b._1 + 1, b._2 + cents(v))

  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(r: (Long, Long)): java.lang.Double =
    if (r._1 == 0) null
    else BigDecimal(r._2.toDouble / 100 / r._1)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)

  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}
