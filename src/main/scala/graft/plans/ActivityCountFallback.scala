package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Analyzer fallback for Teradata's bare `ACTIVITY_COUNT` register
  * (rows affected by the previous statement — see
  * `lineage/SqlPreprocessor.rewriteActivityCount` for the text-rewrite
  * twin used by the lineage pipeline). Through `spark.sql` the token
  * parses cleanly as a COLUMN reference, so the ParseException-driven
  * dialect fallback never fires; without this rule the statement
  * regresses to an unresolved-column analysis error.
  *
  * Fail-safe by construction: the substitution (`CAST(0 AS BIGINT)`,
  * the same constant the text rewrite emits) applies ONLY when the
  * operator's children are fully resolved and NO child output matches
  * the name under the session resolver — a real column named
  * `activity_count` always wins, and multi-part names
  * (`t.activity_count`) are never touched since they can only mean a
  * real column.
  *
  * Injected via [[graft.GraftExtensions]] (injectResolutionRule).
  */
class ActivityCountFallback(spark: SparkSession) extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Expression, NamedExpression}

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case p if p.childrenResolved && !p.resolved =>
        val childOut = p.children.flatMap(_.output)
        def subst(e: Expression): Expression = e.transformUp {
          case UnresolvedAttribute(Seq(name))
              if name.equalsIgnoreCase("activity_count") &&
                !childOut.exists(a => conf.resolver(a.name, name)) =>
            Cast(Literal(0L), LongType)
        }
        // NamedExpression slots (Project/Aggregate lists) must stay
        // named: if the register WAS the top-level item, re-alias the
        // constant under its original name
        p.mapExpressions {
          case ne: NamedExpression => subst(ne) match {
            case still: NamedExpression => still
            case bare => Alias(bare, ne.name)()
          }
          case e => subst(e)
        }
    }
}
