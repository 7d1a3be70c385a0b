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
  * planner strategy ([[graft.plans.AsOfJoinStrategy]]) and the custom
  * codegen function surface (graft_dot / graft_shingles3 /
  * graft_minhash / graft_simhash sig / CMS agg — whatever
  * [[graft.functions.GraftFunctions]] exposes) at session build time.
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
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[functions.DotProduct].getName, "graft_dot"),
      exprs => functions.DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles3"),
      new ExpressionInfo(classOf[functions.WordShingles].getName, "graft_shingles3"),
      exprs => functions.WordShingles(exprs.head, 3)))
  }
}
