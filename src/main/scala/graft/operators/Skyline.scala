package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D max-max skyline (Pareto frontier): keep every row for which no
  * other row is >= on both dimensions and strictly > on at least one.
  * The reference has no such operator (its gold layer stops at grouped
  * aggregates, `silver_to_gold.py`); this is the standard "best
  * price-for-size" dominance filter re-expressed for Spark.
  *
  * Naive formulation is a quadratic NOT EXISTS self-join (that IS our
  * DuckDB oracle). Here: the skyline operator is mergeable —
  * `skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B))` — so we run a
  * LOCAL dominance pass inside each hash bucket first (one window over
  * the bucket), then a GLOBAL pass over the few survivors. At 100 TB the
  * first pass runs where the data sits and eliminates ~everything (for
  * random 2-D data the skyline of an n-row bucket is O(log n) points);
  * only survivors reach the single-partition global window, which is the
  * same collapse a global sort/limit (TakeOrdered) performs and is sized
  * by the FINAL skyline, not the input.
  *
  * Dominance within an ordered set, per window pass (both dims BIGINT,
  * so frame bounds are exact):
  *   - `max(y) OVER (ORDER BY x DESC RANGE UNBOUNDED PRECEDING TO 1
  *     PRECEDING)` = best y among rows with STRICTLY larger x; if that
  *     is >= this y, a strictly-x-larger row dominates.
  *   - `max(y) OVER (PARTITION BY x)` > this y: an equal-x row with
  *     strictly better y dominates.
  * Ties on both dims dominate neither way; duplicates stay, matching the
  * NOT EXISTS oracle exactly.
  */
object Skyline {

  /** @param df   input; xCol/yCol must be integral (exact frame bounds)
    * @param xCol first maximized dimension
    * @param yCol second maximized dimension
    */
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val local = pass(df.withColumn("__b", pmod(xxhash64(col(xCol), col(yCol)), lit(32))),
      xCol, yCol, partExtra = Some("__b")).drop("__b")
    pass(local, xCol, yCol, partExtra = None)
  }

  private def pass(df: DataFrame, x: String, y: String, partExtra: Option[String]): DataFrame = {
    val strictLarger = (partExtra match {
      case Some(b) => Window.partitionBy(col(b)).orderBy(col(x).desc)
      case None => Window.orderBy(col(x).desc)
    }).rangeBetween(Window.unboundedPreceding, -1)
    val sameX = partExtra match {
      case Some(b) => Window.partitionBy(col(b), col(x))
      case None => Window.partitionBy(col(x))
    }
    df
      .withColumn("__mStrict", max(col(y)).over(strictLarger))
      .withColumn("__mSame", max(col(y)).over(sameX))
      .where(
        (col("__mStrict").isNull || col("__mStrict") < col(y)) &&
          col("__mSame") === col(y))
      .drop("__mStrict", "__mSame")
  }
}
