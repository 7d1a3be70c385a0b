package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Library entry point for sessions the USER constructs: registers every
  * graft extension through the standard `SparkSessionExtensions` hook —
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   .getOrCreate()
  * }}}
  *
  * or `.withExtensions(new GraftExtensions)`. Injects the as-of-join
  * planner strategy ([[graft.plans.AsOfJoinStrategy]]) and EVERY custom
  * function [[graft.functions.GraftFunctions]] exposes (graft_dot,
  * graft_shingles3, graft_minhash, graft_cms) — the two routes share
  * one builder list, so they can't drift apart.
  *
  * Inside this repo the driver owns the SparkSession, so the query
  * surface registers the same pieces at runtime
  * ([[graft.plans.AsOfJoinApi.register]], `GraftFunctions.register`) —
  * both routes share the single strategy/function definitions; this
  * class only changes WHEN they attach.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinThresholdRule)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRule)
    ext.injectParser((_, delegate) => new graft.plans.DialectParser(delegate))
    ext.injectResolutionRule(s => new graft.plans.ActivityCountFallback(s))
    functions.GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((
        FunctionIdentifier(name), new ExpressionInfo("graft.functions", name), b))
    }
  }
}
