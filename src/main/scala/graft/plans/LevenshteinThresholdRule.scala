package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: push a comparison threshold INTO levenshtein.
  *
  * `levenshtein(a, b) <= k` computes the full O(|a|*|b|) DP table and
  * then compares; Spark's 3-arg `levenshtein(a, b, k)` runs the banded
  * O(k*max(|a|,|b|)) variant and returns -1 past the threshold. The
  * rewrite
  *
  *   levenshtein(a, b) <= k   ==>   levenshtein(a, b, k) >= 0
  *
  * is exact (probed semantics: dist if dist <= k, else -1) and turns
  * every threshold-filtered fuzzy match (the entity-resolution hot
  * loop, q168/q250/q257) into the banded form. Handles the four
  * comparison spellings with a non-negative integer literal; the
  * rewritten tree no longer matches the pattern, so the rule is a
  * fixpoint after one pass.
  *
  * Attached via [[graft.GraftExtensions]] (injectOptimizerRule) for
  * user-built sessions, or `spark.experimental.extraOptimizations`
  * at runtime (how the driver-owned session gets it).
  */
object LevenshteinThresholdRule extends Rule[LogicalPlan] {

  private def banded(l: Levenshtein, k: Int): Expression =
    GreaterThanOrEqual(l.copy(threshold = Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(l @ Levenshtein(_, _, None), Literal(k: Int, IntegerType))
          if k >= 0 => banded(l, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), l @ Levenshtein(_, _, None))
          if k >= 0 => banded(l, k)
      case LessThan(l @ Levenshtein(_, _, None), Literal(k: Int, IntegerType))
          if k >= 1 => banded(l, k - 1)
      case GreaterThan(Literal(k: Int, IntegerType), l @ Levenshtein(_, _, None))
          if k >= 1 => banded(l, k - 1)
    }
}
