package graft.lineage

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import scala.collection.mutable

/** Transitive closure with distance over lineage edges — the Spark
  * re-design of the reference's downstream-populated summary tables
  * (table_lineage / column_lineage with `distance`,
  * db_setup_ddl.sql:164-190).
  *
  * Lineage graphs are metadata-sized (the reference populates its closure
  * tables with downstream batch SQL over the edge tables), so the default
  * path collects the edge list and runs a driver BFS — O(V·E) on a few
  * thousand rows, no per-iteration Spark jobs, no compounding logical
  * plans. Edge sets too big to collect fall back to an iterative
  * self-join with per-iteration `localCheckpoint` (cuts the plan lineage)
  * and explicit unpersist, so planning cost stays constant per hop.
  */
object Closure {

  /** Above this many distinct edges, use the distributed fixpoint
    * instead of collecting to the driver. */
  val DriverBfsMaxEdges = 100000L

  /** The edge cap alone doesn't bound the OUTPUT: a long chain or dense
    * DAG under the cap can close to O(V²) rows. The driver BFS aborts
    * once it has emitted this many rows and the caller falls back to
    * the distributed fixpoint (~48 MB of (child,parent,dist) rows). */
  val DriverBfsMaxClosureRows = 2000000

  private val outSchema = StructType(Seq(
    StructField("child", StringType),
    StructField("parent", StringType),
    StructField("distance", IntegerType)))

  /** edges: (child, parent) one-hop pairs.
    * Returns (child, parent, distance) with minimal distance, all hops.
    * Caps are parameters only so tests can force the fallback path. */
  def close(
      edges: DataFrame,
      maxIters: Int = 20,
      maxDriverEdges: Long = DriverBfsMaxEdges,
      maxClosureRows: Int = DriverBfsMaxClosureRows): DataFrame = {
    val spark = edges.sparkSession
    val base = edges.select(col("child").cast("string"), col("parent").cast("string"))
      .na.drop().distinct()
    val pairs = base.limit((maxDriverEdges + 1).toInt).collect()
    val onDriver =
      if (pairs.length <= maxDriverEdges)
        closeOnDriver(spark, pairs, maxIters, maxClosureRows)
      else None
    onDriver.getOrElse(closeDistributed(base, maxIters))
  }

  /** Driver BFS; None if the closure outgrows `maxClosureRows`
    * (the caller then reruns distributed — correctness never depends on
    * the driver having enough memory). */
  private def closeOnDriver(
      spark: SparkSession, pairs: Array[Row], maxIters: Int,
      maxClosureRows: Int): Option[DataFrame] = {
    val adj = mutable.HashMap.empty[String, mutable.ArrayBuffer[String]]
    pairs.foreach { r =>
      adj.getOrElseUpdate(r.getString(0), mutable.ArrayBuffer.empty) += r.getString(1)
    }
    val out = mutable.ArrayBuffer.empty[Row]
    val starts = adj.keysIterator
    var overflow = false
    while (starts.hasNext && !overflow) {
      val start = starts.next()
      // BFS from each child: first visit = minimal distance.
      val dist = mutable.HashMap.empty[String, Int]
      var frontier = List(start)
      var d = 0
      while (frontier.nonEmpty && d < maxIters && !overflow) {
        d += 1
        frontier = frontier.flatMap(n => adj.getOrElse(n, Nil))
          .filter(p => !dist.contains(p))
          .distinct
        frontier.foreach { p =>
          dist(p) = d
          out += Row(start, p, d)
        }
        overflow = out.length > maxClosureRows
      }
    }
    if (overflow) None
    else Some(spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1), outSchema))
  }

  /** Iterative self-join fixpoint for edge sets too large to collect.
    * localCheckpoint per iteration keeps the plan O(1); superseded
    * frontiers are unpersisted eagerly. */
  private def closeDistributed(base0: DataFrame, maxIters: Int): DataFrame = {
    val base = base0.withColumn("distance", lit(1)).localCheckpoint()
    var acc = base
    var frontier = base
    var i = 0
    var done = false
    while (!done && i < maxIters) {
      val next = frontier.alias("f")
        .join(base.alias("e"), col("f.parent") === col("e.child"))
        .select(col("f.child").as("child"), col("e.parent").as("parent"),
          (col("f.distance") + 1).as("distance"))
      val fresh = next.join(acc, Seq("child", "parent"), "left_anti")
        .groupBy("child", "parent").agg(min(col("distance")).as("distance"))
        .localCheckpoint() // materializes; cuts lineage; replaces cache+isEmpty job
      if (fresh.isEmpty) done = true
      else {
        val oldAcc = acc
        acc = oldAcc.union(fresh).localCheckpoint()
        oldAcc.unpersist()
        frontier.unpersist()
        frontier = fresh
      }
      i += 1
    }
    acc.groupBy("child", "parent").agg(min(col("distance")).as("distance"))
  }
}
