package graft.lineage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive closure with distance over lineage edges — the Spark
  * re-design of the reference's downstream-populated summary tables
  * (table_lineage / column_lineage with `distance`,
  * db_setup_ddl.sql:164-190). Iterative DataFrame self-join to fixpoint;
  * lineage graphs are metadata-sized, so the loop converges in
  * graph-diameter steps (SURVEY §7.3).
  */
object Closure {

  /** edges: (child, parent) one-hop pairs.
    * Returns (child, parent, distance) with minimal distance, all hops. */
  def close(edges: DataFrame, maxIters: Int = 20): DataFrame = {
    val base = edges.select(col("child"), col("parent"))
      .distinct().withColumn("distance", lit(1))
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
        .cache()
      if (fresh.isEmpty) done = true
      else {
        acc = acc.union(fresh)
        frontier = fresh
      }
      i += 1
    }
    acc.groupBy("child", "parent").agg(min(col("distance")).as("distance"))
  }
}
