package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contiguous global id assignment — `ROW_NUMBER() OVER (ORDER BY ...)`
  * semantics WITHOUT the single-partition sort that a global window
  * forces (the naive form funnels 100 TB through one task).
  *
  * Three distributed steps:
  *  1. range-repartition by the ordering key → partition p holds keys
  *     strictly below partition p+1 (range boundaries from sampling);
  *  2. per-partition positions via a window keyed on the partition id —
  *     partition-local ordering, no global sort;
  *  3. per-partition row counts (a tiny aggregate) become cumulative
  *     offsets, broadcast back, and `offset + position` is the global id.
  *
  * The only driver-side data is the per-partition count vector
  * (numPartitions longs). Ids are dense, start at `startAt`, and equal
  * the global ROW_NUMBER ordering as long as `orderCols` is a total
  * order (make it unique — add a tiebreak column if needed).
  */
object Ids {

  def contiguousIds(
      df: DataFrame,
      orderCols: Seq[Column],
      idCol: String = "id",
      numPartitions: Int = 0,
      startAt: Long = 0L,
  ): DataFrame = {
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.sparkContext.defaultParallelism
    val ranged = df
      .repartitionByRange(n, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
    // localCheckpoint: the count job below and the final id job must see
    // the SAME range partitioning — repartitionByRange draws sampling-
    // based boundaries per execution, so an unpinned plan can hand the
    // two jobs different partition assignments and misalign the offsets
    val positioned = ranged.withColumn("__pos", row_number().over(w))
      .localCheckpoint()
    val counts = positioned.groupBy("__pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft(0 -> startAt) {
      case ((_, acc), (pid, c)) => pid -> (acc + c)
    }
    // offset for pid = sum of counts of all LOWER pids. Ship the
    // (pid, offset) vector back as a BROADCAST join, not a when-chain
    // expression: folding thousands of partitions into nested
    // when/otherwise blows up the expression tree and codegen at exactly
    // the partition counts 100 TB implies (same shape as Packing).
    val spark = df.sparkSession
    import spark.implicits._
    val offsetRows = counts.map(_._1).zip(offsets.map(_._2))
    val offsetsDf = broadcast(offsetRows.toSeq.toDF("__pid", "__off"))
    positioned
      .join(offsetsDf, Seq("__pid"))
      .withColumn(idCol, col("__off") + col("__pos") - 1)
      .drop("__pid", "__pos", "__off")
  }
}
