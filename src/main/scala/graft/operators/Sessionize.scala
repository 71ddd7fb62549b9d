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

  /** Per-EVENT session-relative features — the columns a behavioral
    * model trains on: the session the event belongs to, its index
    * within the session, and seconds since the session started.
    *
    * Costs one shuffle (by user_id, for the flag/cumsum pass); the
    * second window partitions by (user_id, session_idx), which the
    * existing hash partitioning already satisfies (hash keys ⊆
    * clustering keys), so Catalyst adds only a per-partition re-sort,
    * no second exchange.
    */
  def eventFeatures(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val gapNs = gapSeconds * 1000000000L
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val bySession = Window
      .partitionBy(col("user_id"), col("session_idx"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn(
        "is_new",
        when(col("prev_ts").isNull || col("ts") - col("prev_ts") > gapNs, 1L)
          .otherwise(0L),
      )
      .withColumn("session_idx", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("idx_in_session", row_number().over(bySession).cast("long"))
      // running min == session start, since the frame is ordered by ts
      .withColumn("secs_since_start",
        expr("(ts - min(ts) OVER (PARTITION BY user_id, session_idx)) div 1000000000"))
      .select("event_id", "user_id", "session_idx", "idx_in_session", "secs_since_start")
  }
}
