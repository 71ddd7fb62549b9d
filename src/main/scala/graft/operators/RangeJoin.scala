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

  /** Interval-OVERLAP join: pairs of intervals with a non-empty
    * intersection — `max(s1, s2) < min(e1, e2)`, half-open semantics.
    * (Stated as the intersection, not the `s1 < e2 && s2 < e1` shortcut:
    * the two differ on zero-width intervals, which intersect nothing.)
    *
    * Columns must be INTEGER-valued (epoch seconds/millis/nanos): bucket
    * ids are computed in exact long arithmetic — `(c - pmod(c, w)) div w`
    * is floor division with no double rounding, which matters because the
    * replication range and the keep-one-bucket filter must agree exactly
    * even at nanosecond magnitudes (> 2^53, where a double divide can
    * misplace a boundary bucket and silently drop a pair).
    *
    * Same bucketization as [[rangeJoin]], on both sides: each interval
    * replicates into every bucket it touches, overlap implies sharing at
    * least one bucket, and double-matches (a pair overlapping in several
    * buckets) are eliminated WITHOUT a global distinct: the pair is kept
    * only in the bucket containing the overlap's start — each surviving
    * pair emits exactly once, so no post-join dedup shuffle.
    */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      bucketWidth: Long,
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // exact floor division for longs: numerator is a multiple of w, so
    // SQL `div` divides it exactly for any sign
    def floorDiv(c: org.apache.spark.sql.Column) = {
      val cl = c.cast("long")
      call_function("div", cl - pmod(cl, lit(bucketWidth)), lit(bucketWidth))
    }
    def bucketed(df: DataFrame, s: String, e: String) = df
      .where(col(s) < col(e)) // zero-width intervals intersect nothing
      .withColumn(
        "__bucket",
        // half-open integer interval: last touched bucket is floor((e-1)/w)
        explode(sequence(floorDiv(col(s)), floorDiv(col(e).cast("long") - 1))),
      )
    bucketed(left, leftStart, leftEnd)
      .join(bucketed(right, rightStart, rightEnd), Seq("__bucket"))
      .where(greatest(col(leftStart), col(rightStart)) <
        least(col(leftEnd), col(rightEnd)))
      .where(col("__bucket") === floorDiv(greatest(col(leftStart), col(rightStart))))
      .drop("__bucket")
  }
}
