package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Time-series regularization: resampling onto a fixed grid, gap filling,
  * and linear interpolation. This is the batch twin of the reference's
  * 15-minute power / hourly price series handling
  * (reference: src/transformations/bronze_to_silver.py:65-96 builds the
  * regular per-interval series; it never has to fill holes because the
  * upstream API returns dense arrays — at 100 TB ingest, holes are the
  * norm and this operator family closes them).
  *
  * Scale posture:
  *  - the per-key hourly aggregate is one shuffle on (key, hour);
  *  - the spine is generated from each key's own [min, max] bounds —
  *    `sequence()` per key row, so no driver-side range materialization
  *    and no cross join against a global calendar;
  *  - fill/interpolation are single window passes per key, which AQE can
  *    coalesce; no self-joins, no collect.
  *
  * Cross-engine determinism: hourly sums accumulate DECIMAL(20,4) (exact,
  * order-independent) and are cast to double once; interpolation arithmetic
  * is written as the identical double expression the DuckDB oracle uses, so
  * results are bit-equal.
  */
object TimeSeries {

  /** Per-(user, hour) event aggregate: count + exact-decimal value sum. */
  def hourly(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), date_trunc("hour", col("ts_sec")).as("hr"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(20, 4))).as("vsum"),
      )

  /** Dense hourly spine per user spanning that user's [first, last] active
    * hour, with actual aggregates left-joined on (missing hours carry
    * n_events = 0 and a NULL sum).
    */
  def hourlySpine(events: DataFrame): DataFrame = {
    val h = hourly(events)
    val spine = h
      .groupBy("user_id")
      .agg(min(col("hr")).as("mn"), max(col("hr")).as("mx"))
      .select(col("user_id"),
        explode(expr("sequence(mn, mx, interval 1 hour)")).as("hr"))
    spine.join(h, Seq("user_id", "hr"), "left")
  }

  /** Gap-fill by forward fill (last observation carried forward): every
    * hour in the spine gets the most recent known hourly sum.
    */
  def gapFillForward(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("hr")
    hourlySpine(events)
      .select(
        col("user_id"), col("hr"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("vsum").cast(DoubleType), ignoreNulls = true).over(w)
          .as("v_fill"),
      )
  }

  /** Gap-fill by linear interpolation between the surrounding observed
    * hours (endpoints fall back to nearest-observation). `is_actual`
    * distinguishes observed rows from synthesized ones.
    */
  def interpolateLinear(events: DataFrame): DataFrame = {
    // Both lookups are RUNNING frames (UnboundedPreceding → CurrentRow):
    // the "next observation" scans hr DESCENDING rather than using a
    // shrinking CurrentRow → UnboundedFollowing frame, which Spark's
    // WindowExec re-evaluates from scratch per row — O(rows²) per
    // partition (measured: 94 s at sf0.1 vs ~2 s this way).
    val back = Window.partitionBy("user_id").orderBy(col("hr").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwdAsBack = Window.partitionBy("user_id").orderBy(col("hr").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val es = unix_timestamp(col("hr"))
    val vd = col("vsum").cast(DoubleType)
    val pv = last(vd, ignoreNulls = true).over(back)
    val pt = last(when(col("vsum").isNotNull, es), ignoreNulls = true).over(back)
    val nv = last(vd, ignoreNulls = true).over(fwdAsBack)
    val nt = last(when(col("vsum").isNotNull, es), ignoreNulls = true).over(fwdAsBack)
    // Identical double-expression shape on the oracle side: pv + (nv-pv) * (dt/g)
    val interp = when(col("vsum").isNotNull, vd)
      .when(pv.isNull, nv)
      .when(nv.isNull, pv)
      .otherwise(pv + (nv - pv) *
        ((es - pt).cast(DoubleType) / (nt - pt).cast(DoubleType)))
    hourlySpine(events)
      .select(
        col("user_id"), col("hr"),
        col("vsum").isNotNull.cast(IntegerType).as("is_actual"),
        interp.as("v_interp"),
      )
  }

  /** Time-based sliding aggregate: per-event sum/count of the trailing
    * `windowSec` seconds of the same user's activity (RANGE frame over
    * epoch seconds — ties share a frame on both engines). The decimal
    * accumulator keeps the running sums exact and order-independent.
    */
  def trailingWindow(events: DataFrame, windowSec: Long): DataFrame = {
    val es = unix_timestamp(col("ts_sec"))
    val w = Window.partitionBy("user_id").orderBy("es")
      .rangeBetween(-(windowSec - 1), 0)
    events
      .select(col("event_id"), col("user_id"), es.as("es"),
        col("value").cast(DecimalType(20, 4)).as("vdec"))
      .select(
        col("event_id"), col("user_id"), col("es"),
        count(lit(1)).over(w).as("mv_n"),
        sum(col("vdec")).over(w).cast(DoubleType).as("mv_sum"),
      )
  }
}
