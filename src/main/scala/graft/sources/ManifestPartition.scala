package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** Partition TRANSFORM of a manifest table ("partitionBy" sink option /
  * catalog `PARTITIONED BY`): either identity on a BIGINT column (one
  * file per distinct value — bounded key domains only) or
  * `bucket(n, col)` (one file per hash bucket — the high-cardinality
  * answer: at most n files per task regardless of key count, and two
  * n-bucket tables still storage-partition-join with zero exchanges).
  *
  * The rendered form is what manifest entries record in `pt`: a bare
  * column name for identity (backward compatible with every manifest
  * written before bucketing existed) or `bucket(n,col)`.
  */
private[graft] sealed trait ManifestPartSpec {
  def col: String
  /** Partition value for a non-null key. */
  def pv(v: Long): Long
  /** Canonical `pt` rendering. */
  def render: String
}

private[graft] case class IdentityPartSpec(col: String)
  extends ManifestPartSpec {
  override def pv(v: Long): Long = v
  override def render: String = col
}

private[graft] case class BucketPartSpec(n: Int, col: String)
  extends ManifestPartSpec {
  require(n > 0, s"bucket count must be positive, got $n")
  /** MUST agree with [[GraftBucketFunction]] — the function the scan
    * reports in its KeyGroupedPartitioning and the catalog serves. */
  override def pv(v: Long): Long = math.floorMod(v, n.toLong)
  override def render: String = s"bucket($n,$col)"
}

private[graft] object ManifestPartSpec {
  private val BucketRe = """bucket\(\s*(\d+)\s*,\s*([A-Za-z0-9_]+)\s*\)""".r

  def parse(s: String): ManifestPartSpec = s.trim match {
    case BucketRe(n, col) => BucketPartSpec(n.toInt, col)
    case col if col.matches("[A-Za-z0-9_]+") => IdentityPartSpec(col)
    case other => throw new IllegalArgumentException(
      s"ManifestSink: bad partitionBy '$other' — use a BIGINT column " +
        "name (identity) or bucket(n, col)")
  }
}

/** The catalog-served V2 bucket function: `bucket(n, col) =
  * floorMod(col, n)`. Exactly the function [[BucketPartSpec.pv]]
  * evaluates at write fan-out and the scan names in its
  * `KeyGroupedPartitioning` — Spark's storage-partitioned join matches
  * both sides by this function's `canonicalName` plus the bucket
  * count, so all three sites must stay one definition. */
private[graft] object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): floorMod(col, n) — manifest table bucket transform"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2,
      s"bucket takes (n INT, col BIGINT), got ${inputType.catalogString}")
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] =
        Array(IntegerType, LongType)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String = "graft.manifest.bucket"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): Integer =
        math.floorMod(input.getLong(1), input.getInt(0).toLong).toInt
    }
  }
}
