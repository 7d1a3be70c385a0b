package graft.plans

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DataType

/** A registered materialized view: a pre-aggregated table that can
  * answer GROUP BY rollups over the fact table it was built from.
  *
  * @param factSuffix  identifies the fact scan by file-location suffix
  *                    (e.g. "lineitem.parquet")
  * @param dims        fact dimension columns the MV carries verbatim —
  *                    a query may group by any SUBSET of these
  * @param sums        fact measure column -> (MV partial-sum column,
  *                    the exact Cast target the MV applied before
  *                    summing; a query must cast identically or the
  *                    rewrite declines)
  * @param cntCol      MV column holding count(*) per MV group
  * @param mv          analyzed plan of the MV scan (a bare relation)
  */
final case class GraftMv(
    factSuffix: String,
    dims: Set[String],
    sums: Map[String, (String, DataType)],
    cntCol: String,
    mv: LogicalPlan)

/** Calcite-style aggregate rollup rewrite as a Catalyst
  * `Rule[LogicalPlan]`: when a query aggregates the registered fact
  * table grouping on a subset of the MV's dimensions and every
  * aggregate is re-expressible from the MV's partials
  * (`sum(x)` → `sum(mv.sum_x)`, `count(*)` → `sum(mv.cnt)`), the fact
  * scan is replaced by the MV scan. At 100 TB this is the difference
  * between re-scanning the fact table and re-aggregating a few
  * thousand pre-agg rows — the scan drops by the MV's compression
  * ratio, and correctness is purely algebraic (sum and count are
  * self-decomposable; the spec cross-checks against the base table).
  *
  * Scope is deliberately tight and fail-closed: bare scan (no residual
  * filter), grouping keys that are plain MV dimension attributes, and
  * only decomposable aggregates — anything else leaves the plan
  * untouched. Output attribute ids, names, and types are preserved
  * exactly (partial re-sums are cast back to the original result
  * type), so parent operators never see the substitution.
  *
  * Gated per-session by `spark.graft.mvRewrite` (default off) so the
  * MV build itself — an aggregate over the same fact scan — can never
  * self-rewrite.
  *
  * Attach via `spark.experimental.extraOptimizations` (runs after the
  * standard optimizer batches, so the fact scan is already pruned to a
  * stable shape) or through [[graft.GraftExtensions]] in user sessions.
  */
object MvRewriteRule extends Rule[LogicalPlan] {

  private val registered = new AtomicReference[GraftMv](null)

  def register(mv: GraftMv): Unit = registered.set(mv)
  def clear(): Unit = registered.set(null)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val mv = registered.get
    if (mv == null ||
      conf.getConfString("spark.graft.mvRewrite", "false") != "true") plan
    else plan.transformUp {
      case agg @ Aggregate(groups, aggs, child, _) if isFactScan(child, mv) =>
        rewrite(groups, aggs, mv).getOrElse(agg)
    }
  }

  /** The fact scan, optionally under the column-pruning Project the
    * optimizer has already inserted. Any other shape (filters, joins)
    * declines — a residual filter over pre-aggregated rows would be
    * semantically wrong, not just unprofitable. */
  private def isFactScan(p: LogicalPlan, mv: GraftMv): Boolean = p match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.exists(_.toString.endsWith(mv.factSuffix))
      case _ => false
    }
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      isFactScan(c, mv)
    case _ => false
  }

  private def rewrite(
      groups: Seq[Expression],
      aggs: Seq[NamedExpression],
      mv: GraftMv): Option[LogicalPlan] = {
    def mvAttr(n: String): Option[Attribute] = mv.mv.output.find(_.name == n)
    val mvOut = AttributeSet(mv.mv.output)

    val newGroups: Seq[Expression] = groups.map {
      case a: AttributeReference if mv.dims.contains(a.name) =>
        mvAttr(a.name).getOrElse(return None)
      case _ => return None
    }

    def reSum(e: Expression): Option[Expression] = e match {
      // sum(CAST(measure AS dt)) with the MV's exact cast -> sum(partial)
      case Cast(a: AttributeReference, dt, _, _) =>
        mv.sums.get(a.name).collect { case (col, mvDt) if mvDt == dt => col }
          .flatMap(mvAttr)
      case a: AttributeReference =>
        mv.sums.get(a.name).collect { case (col, mvDt) if mvDt == a.dataType => col }
          .flatMap(mvAttr)
      case _ => None
    }

    // Rewrite each output expression in place: decomposable aggregate
    // calls become re-aggregations of the MV partials (cast back to
    // the original result type) and dimension references move to the
    // MV's attributes. Output names and exprIds are preserved so
    // parent operators resolve unchanged. CollapseProject may have
    // merged post-aggregation scalar work (casts, arithmetic) into
    // these expressions — transformUp handles aggregates at any depth.
    val newAggs: Seq[NamedExpression] = aggs.map {
      case a: AttributeReference if mv.dims.contains(a.name) =>
        Alias(mvAttr(a.name).getOrElse(return None), a.name)(exprId = a.exprId)
      case ne =>
        // Fail closed BEFORE substituting: every aggregate call in this
        // output expression must be one of the decomposable forms below.
        // Without this pre-check, an unrecognized aggregate over a dim
        // column (count(dim), avg(dim) — duplicate-sensitive over MV
        // group rows) would have its dim reference rewritten by the
        // catch-all case, pass the subsetOf(mvOut) check, and silently
        // aggregate over MV groups instead of fact rows.
        val allAggsDecomposable =
          ne.collect { case ae: AggregateExpression => ae }.forall {
            case AggregateExpression(Sum(e, _), Complete, false, None, _) =>
              reSum(e).isDefined
            case AggregateExpression(
                Count(Seq(Literal(_, _))), Complete, false, None, _) =>
              mvAttr(mv.cntCol).isDefined
            case _ => false
          }
        if (!allAggsDecomposable) return None
        var ok = true
        val replaced = ne.transformUp {
          case ae @ AggregateExpression(Sum(e, _), Complete, false, None, _) =>
            reSum(e) match {
              case Some(p) => Cast(
                AggregateExpression(Sum(p), Complete, isDistinct = false),
                ae.dataType)
              case None => ok = false; ae
            }
          case ae @ AggregateExpression(
              Count(Seq(Literal(_, _))), Complete, false, None, _) =>
            mvAttr(mv.cntCol) match {
              case Some(c) => Cast(
                AggregateExpression(Sum(c), Complete, isDistinct = false),
                ae.dataType)
              case None => ok = false; ae
            }
          case a: AttributeReference if mv.dims.contains(a.name) =>
            mvAttr(a.name).getOrElse { ok = false; a }
        }
        // fail closed: every reference must now resolve against the MV
        // (an unhandled aggregate kind or a non-dim column keeps fact
        // references and declines the whole rewrite)
        if (!ok || !replaced.references.subsetOf(mvOut)) return None
        replaced.asInstanceOf[NamedExpression]
    }
    Some(Aggregate(newGroups, newAggs, mv.mv))
  }
}
