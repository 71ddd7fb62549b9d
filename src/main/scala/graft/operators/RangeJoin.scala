package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range (interval) join: match point rows to interval rows with
  * `start <= point < end`.
  *
  * A naive inequality join plans as BroadcastNestedLoopJoin —
  * O(points x intervals) comparisons, hopeless at scale. This
  * implementation quantizes time into fixed-width buckets: each interval
  * replicates into every bucket it overlaps, each point lands in exactly
  * one bucket, and the match becomes an equi-join on bucket id with a
  * residual range predicate. Cost: one shuffle of each side by bucket,
  * join fan-in limited to per-bucket density — the standard trick behind
  * interval-join support in streaming/temporal engines.
  *
  * `bucketWidth` should be >= the typical interval width (each interval
  * replicates ceil(width/bucketWidth)+1 times).
  */
object RangeJoin {

  /** @param points     rows with a numeric point column `pointCol`
    * @param intervals  rows with numeric `startCol` (inclusive) and
    *                   `endCol` (exclusive)
    * @param bucketWidth bucket size in the same units as the columns
    */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bucket",
      floor(col(pointCol).divide(bucketWidth)).cast("long"))
    val iv = intervals
      .where(col(startCol) < col(endCol)) // empty intervals match nothing
      .withColumn(
        "__bucket",
        explode(sequence(
          floor(col(startCol).divide(bucketWidth)).cast("long"),
          // end is exclusive: last overlapped bucket = ceil(end/w) - 1.
          // (NOT (end-1)/w, which under-replicates fractional intervals:
          // [0.0, 10.5) with w=10 must reach bucket 1.)
          (ceil(col(endCol).divide(bucketWidth)) - 1).cast("long"),
        )),
      )
    p.join(iv, Seq("__bucket"))
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }
}
