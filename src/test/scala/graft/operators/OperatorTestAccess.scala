package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-scope bridge to `private[operators]` internals, so specs in
  * package `graft` can pin operator building blocks directly. */
object OperatorTestAccess {
  def coSupplyEdges(s: SparkSession, dir: String): DataFrame =
    GraphOps.edges(s, dir)
}
