package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge

/** Planner strategy + user-facing API for [[AsOfJoin]].
  *
  * The strategy is injected at runtime via the session's experimental
  * strategies (equivalent to
  * `SparkSessionExtensions.injectPlannerStrategy` for sessions we don't
  * construct — the driver owns the session here).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

object AsOfJoinApi {

  def register(spark: SparkSession): Unit =
    Bridge.addStrategy(spark, AsOfJoinStrategy)

  /** left.asofJoin(right): for each left row, the right row with equal
    * `key` and the greatest `time` <= left `time`; left-outer. Column
    * names must be disjoint (rename beforehand). */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val plan = AsOfJoin(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      Bridge.expr(left.col(leftKey)), Bridge.expr(right.col(rightKey)),
      Bridge.expr(left.col(leftTime)), Bridge.expr(right.col(rightTime)))
    Bridge.ofRows(spark, plan)
  }
}
