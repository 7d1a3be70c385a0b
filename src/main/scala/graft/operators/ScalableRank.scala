package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Dense contiguous 1..N ranking in a prescribed total order WITHOUT a
  * global window. `row_number() OVER (ORDER BY ...)` funnels the whole
  * relation through one partition; this is the scale form (the q267
  * pattern, factored out): range-repartition on the order keys, sort
  * within partitions, prefix-sum the partition-count-sized tallies on
  * the driver, and add the local index back per partition. Ranks
  * depend only on the total order — the sampled range boundaries are
  * pinned by a localCheckpoint so the tally pass and the assignment
  * pass see the same partitioning. The order keys must be a total
  * order (add a unique tiebreaker column if needed). */
object ScalableRank {

  def withRank(df: DataFrame, rankCol: String, keys: Column*): DataFrame = {
    val parts = math.max(df.sparkSession.sparkContext.defaultParallelism
      / 4, 4)
    val sorted = df.repartitionByRange(parts, keys: _*)
      .sortWithinPartitions(keys: _*)
      .localCheckpoint()
    val counts = sorted.rdd
      .mapPartitionsWithIndex { case (i, it) =>
        Iterator((i, it.size.toLong)) }
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val bc = sorted.sparkSession.sparkContext.broadcast(offsets)
    val schema = sorted.schema.add(rankCol, LongType, nullable = false)
    sorted.sparkSession.createDataFrame(
      sorted.rdd.mapPartitionsWithIndex { case (pid, it) =>
        val base = bc.value(pid)
        it.zipWithIndex.map { case (row, i) =>
          Row.fromSeq(row.toSeq :+ (base + i + 1)) }
      }, schema)
  }
}
