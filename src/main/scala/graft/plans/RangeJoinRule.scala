package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, TimestampType}

/** Range-join optimization as a Catalyst `Rule[LogicalPlan]`: an INNER
  * join whose ONLY cross-side predicates are an interval containment
  * (`point >= lo AND point <= hi`, any orientation) has no equi-join
  * key, so Spark plans a nested-loop join — every point row compared
  * against every interval row, the classic scale killer for
  * event-in-window joins. This rule rewrites it into a bucketed
  * equi-join, the same trick Databricks ships as the range-join hint:
  *
  *  - the point side gains `bucket = floorDiv(point, W)`;
  *  - the interval side explodes into one row per covered bucket via
  *    `explode(sequence(floorDiv(lo, W), floorDiv(hi, W)))`;
  *  - the join becomes `p.bucket = i.bucket AND <original condition>`
  *    — a shuffle/broadcast HASH join the planner can distribute.
  *
  * Every matching pair survives exactly once: a point has exactly one
  * bucket, and an interval covers each of its buckets exactly once.
  * The original condition stays as the residual filter, so bucket
  * granularity affects only efficiency, never the result. floorDiv is
  * built from `Pmod` (`(x - pmod(x, W)) / W`), exact on negatives —
  * Spark's `div` truncates toward zero and would split a bucket at 0.
  *
  * Scope is tight and fail-closed: INNER joins only, no existing
  * cross-side equality (those already hash-join), point/lo/hi integral
  * (long/int) or timestamp expressions each referencing exactly
  * one side. Interval rows with `lo > hi` or NULL bounds are filtered
  * on the build side — they can never satisfy the containment.
  *
  * Gated by `spark.graft.rangeJoin.bucketWidth` (a positive long in
  * the point column's units; 0 = off). Pick W near the typical
  * interval length: the interval side grows by ~(len/W + 1) rows and
  * each point probes one bucket. Attach via
  * `spark.experimental.extraOptimizations` or [[GraftExtensions]].
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.rangeJoin.bucketWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = conf.getConfString(WidthConf, "0").toLong
    if (w <= 0) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) => rewrite(j, w).getOrElse(j)
    }
  }

  private def bucketable(e: Expression): Boolean = e.dataType match {
    // no DateType: Spark forbids CAST(date AS BIGINT) — pre-cast dates
    case LongType | IntegerType | TimestampType => true
    case _ => false
  }

  private def floorDiv(e: Expression, w: Long): Expression = {
    // no-op casts and a missing timeZoneId both leave the plan
    // unresolved post-analysis — cast only when needed, with the
    // session zone pinned
    val x = if (e.dataType == LongType) e
      else Cast(e, LongType, Some(conf.sessionLocalTimeZone))
    val width = Literal(w, LongType)
    new IntegralDivide(Subtract(x, new Pmod(x, width)), width)
  }

  private def rewrite(j: Join, w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    val leftOut = j.left.outputSet
    val rightOut = j.right.outputSet

    def sideOf(e: Expression): Option[Boolean] = // Some(true)=left
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(leftOut)) Some(true)
      else if (e.references.subsetOf(rightOut)) Some(false)
      else None

    // any cross-side equality → Spark already hash-joins; stay out
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (sideOf(a), sideOf(b)) match {
          case (Some(x), Some(y)) => x != y
          case _ => false
        }
      case _ => false
    }
    if (hasEqui) return None

    // collect candidate (point >= lo) and (point <= hi) cross-side
    // bounds, normalized to (point, bound)
    def asLower(c: Expression): Option[(Expression, Expression)] = c match {
      case GreaterThanOrEqual(p, lo) => Some((p, lo))
      case LessThanOrEqual(lo, p) => Some((p, lo))
      case _ => None
    }
    def asUpper(c: Expression): Option[(Expression, Expression)] = c match {
      case LessThanOrEqual(p, hi) => Some((p, hi))
      case GreaterThanOrEqual(hi, p) => Some((p, hi))
      case _ => None
    }
    def crossSide(p: Expression, b: Expression): Boolean =
      (sideOf(p), sideOf(b)) match {
        case (Some(x), Some(y)) => x != y
        case _ => false
      }

    val lowers = conjuncts.flatMap(asLower).filter {
      case (p, b) => crossSide(p, b) && bucketable(p) && bucketable(b)
    }
    val uppers = conjuncts.flatMap(asUpper).filter {
      case (p, b) => crossSide(p, b) && bucketable(p) && bucketable(b)
    }
    val pair = (for {
      (p1, lo) <- lowers
      (p2, hi) <- uppers
      if p1.semanticEquals(p2) && sideOf(lo) == sideOf(hi)
    } yield (p1, lo, hi)).headOption
    val (pt, lo, hi) = pair.getOrElse(return None)

    val pointOnLeft = sideOf(pt).get
    val (pointPlan, intervalPlan) =
      if (pointOnLeft) (j.left, j.right) else (j.right, j.left)

    val pBucket = Alias(floorDiv(pt, w), "__graft_rj_pb")()
    val newPoint = Project(pointPlan.output :+ pBucket, pointPlan)

    // drop rows that can never satisfy the containment, then explode
    // the covered bucket range (ascending by construction)
    val keepable = And(And(IsNotNull(lo), IsNotNull(hi)),
      LessThanOrEqual(lo, hi))
    val seq = new Sequence(floorDiv(lo, w), floorDiv(hi, w))
      .withTimeZone(conf.sessionLocalTimeZone)
      .asInstanceOf[Sequence]
    val iBucket = AttributeReference("__graft_rj_ib", LongType,
      nullable = seq.dataType.asInstanceOf[
        org.apache.spark.sql.types.ArrayType].containsNull)()
    val newInterval = Generate(Explode(seq), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(iBucket),
      child = Filter(keepable, intervalPlan))

    val (newLeft, newRight) =
      if (pointOnLeft) (newPoint, newInterval) else (newInterval, newPoint)
    val newCond = (EqualTo(pBucket.toAttribute, iBucket) +: conjuncts)
      .reduce(And)
    val joined = Join(newLeft, newRight, Inner, Some(newCond), j.hint)
    Some(Project(j.output, joined))
  }
}
