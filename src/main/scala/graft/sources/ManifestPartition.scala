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

/** `truncate(w, col)`: hidden RANGE partitioning — every row of a file
  * has `col` in `[pv, pv + w)` (pv = floor-to-width). The days(ts)
  * shape for epoch columns (w = 86400 buckets epoch-seconds by day):
  * a time-range probe prunes STRUCTURALLY from the partition value,
  * stats or no stats. */
private[graft] case class TruncatePartSpec(w: Long, col: String)
  extends ManifestPartSpec {
  require(w > 0, s"truncate width must be positive, got $w")
  override def pv(v: Long): Long = v - math.floorMod(v, w)
  override def render: String = s"truncate($w,$col)"
}

private[graft] object ManifestPartSpec {
  private val BucketRe = """bucket\(\s*(\d+)\s*,\s*([A-Za-z0-9_]+)\s*\)""".r
  private val TruncRe = """truncate\(\s*(\d+)\s*,\s*([A-Za-z0-9_]+)\s*\)""".r

  /** Multi-transform spec: top-level commas separate transforms
    * ("bucket(8,k),region" — commas inside a transform's parentheses
    * don't split). One transform parses to a single-element list. */
  def parseMulti(s: String): Seq[ManifestPartSpec] = {
    val parts = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => parts += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    parts += s.substring(start)
    val specs = parts.result().map(parse)
    require(specs.map(_.col).distinct.length == specs.length,
      s"ManifestSink: duplicate partition column in '$s'")
    specs
  }

  def parse(s: String): ManifestPartSpec = s.trim match {
    case BucketRe(n, col) => BucketPartSpec(n.toInt, col)
    case TruncRe(w, col) => TruncatePartSpec(w.toLong, col)
    case col if col.matches("[A-Za-z0-9_]+") => IdentityPartSpec(col)
    case other => throw new IllegalArgumentException(
      s"ManifestSink: bad partitionBy '$other' — use a BIGINT column " +
        "name (identity), bucket(n, col), or truncate(w, col)")
  }

  /** STRUCTURAL partition pruning: can any row of a file with
    * partition value `pv` under `spec` satisfy `f`? Decided from the
    * transform's VALUE-RANGE guarantee alone — identity pins the
    * column to exactly pv, truncate bounds it to [pv, pv+w), bucket
    * pins its residue class — so pruning works on manifests with no
    * column stats at all (and, for bucket, where min/max never could:
    * a point lookup plans only its bucket's files). Conservative:
    * `true` whenever the spec can't PROVE emptiness. */
  def pvMayMatch(spec: ManifestPartSpec, pv: Long,
      f: org.apache.spark.sql.sources.Filter): Boolean = {
    import org.apache.spark.sql.sources._
    def long(v: Any): Option[Long] = v match {
      case n: Number => Some(n.longValue())
      case _ => None
    }
    // [lo, hi] (inclusive) range of spec.col within this partition;
    // None = the transform gives no contiguous range (bucket)
    val range: Option[(Long, Long)] = spec match {
      case IdentityPartSpec(_) => Some((pv, pv))
      case TruncatePartSpec(w, _) =>
        // saturating upper bound: when v ≡ 0 (mod w) near Long.MaxValue,
        // pv = v and pv + w - 1 would wrap negative (hi < lo), letting
        // range predicates prune files that DO hold matching rows
        val hi = if (pv > Long.MaxValue - (w - 1)) Long.MaxValue
          else pv + w - 1
        Some((pv, hi))
      case BucketPartSpec(_, _) => None
    }
    f match {
      case EqualTo(a, v) if a == spec.col =>
        long(v).forall { x =>
          spec match {
            case b: BucketPartSpec => b.pv(x) == pv
            case _ => range.forall { case (lo, hi) => x >= lo && x <= hi }
          }
        }
      case GreaterThan(a, v) if a == spec.col =>
        long(v).forall(x => range.forall { case (_, hi) => hi > x })
      case GreaterThanOrEqual(a, v) if a == spec.col =>
        long(v).forall(x => range.forall { case (_, hi) => hi >= x })
      case LessThan(a, v) if a == spec.col =>
        long(v).forall(x => range.forall { case (lo, _) => lo < x })
      case LessThanOrEqual(a, v) if a == spec.col =>
        long(v).forall(x => range.forall { case (lo, _) => lo <= x })
      case In(a, vs) if a == spec.col =>
        vs.isEmpty || vs.exists(v => pvMayMatch(spec, pv, EqualTo(a, v)))
      case _ => true // other columns / shapes: no structural verdict
    }
  }
}

/** The catalog-served V2 bucket function: `bucket(n, col) =
  * floorMod(col, n)`. Exactly the function [[BucketPartSpec.pv]]
  * evaluates at write fan-out and the scan names in its
  * `KeyGroupedPartitioning` — Spark's storage-partitioned join matches
  * both sides by this function's `canonicalName` plus the bucket
  * count, so all three sites must stay one definition. */
/** The catalog-served V2 truncate function: `truncate(w, col) =
  * col − floorMod(col, w)` — one definition with
  * [[TruncatePartSpec.pv]] and the scan's reported transform. */
private[graft] object GraftTruncateFunction extends UnboundFunction {
  override def name(): String = "truncate"
  override def description(): String =
    "truncate(w, col): col - floorMod(col, w) — manifest range transform"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2,
      s"truncate takes (w BIGINT, col BIGINT), got ${inputType.catalogString}")
    new ScalarFunction[java.lang.Long] {
      override def inputTypes(): Array[DataType] = Array(LongType, LongType)
      override def resultType(): DataType = LongType
      override def name(): String = "truncate"
      override def canonicalName(): String = "graft.manifest.truncate"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): java.lang.Long = {
        val w = input.getLong(0); val v = input.getLong(1)
        v - math.floorMod(v, w)
      }
    }
  }
}

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
