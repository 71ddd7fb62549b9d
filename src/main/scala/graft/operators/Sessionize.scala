package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization over the events table: a session is a maximal run
  * of a user's events with gaps < `gapSeconds`. Classic lag/cumsum window
  * construction — one shuffle by user_id, then linear per-partition work.
  *
  * Ordering uses the raw nanosecond `ts` long (plus event_id as a
  * tiebreak) so session boundaries are deterministic even where
  * second-truncated timestamps collide.
  */
object Sessionize {

  def sessions(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val gapNs = gapSeconds * 1000000000L
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val withFlag = events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn(
        "is_new",
        when(col("prev_ts").isNull || col("ts") - col("prev_ts") > gapNs, 1L)
          .otherwise(0L),
      )
      .withColumn("session_idx", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withFlag
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        expr("timestamp_seconds(min(ts) div 1000000000)").as("session_start"),
        expr("(max(ts) - min(ts)) div 1000000000").as("duration_sec"),
      )
  }
}
