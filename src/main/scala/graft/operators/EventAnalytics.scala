package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over the event stream: ordered funnels, cohort
  * retention, and cumulative-distinct user counts. These are the classic
  * product-analytics operators a warehouse engine is expected to run over
  * the raw events table (the reference's gold layer stops at daily
  * aggregates — reference: src/transformations/silver_to_gold.py:29-65).
  *
  * Scale posture: everything reduces per `user_id` first (one shuffle on
  * the user key, map-side partial aggregation), and only per-user scalars
  * (first-touch timestamps, first-seen days) flow into the later stages,
  * which are tiny. No self-joins over raw events; no collect.
  */
object EventAnalytics {

  /** Ordered three-step funnel as one relational plan (no driver-side
    * actions): a row per step with the count of users whose earliest
    * step-i event happens strictly after their earliest qualifying
    * step-(i-1) event. Each stage is a per-user min-aggregate; only
    * per-user scalars flow between stages.
    */
  def funnel3(events: DataFrame, s1: String, s2: String, s3: String): DataFrame = {
    val ev = events.select(col("user_id"), col("event_type"), col("ts_sec"))
    val t1 = ev.where(col("event_type") === s1)
      .groupBy("user_id").agg(min(col("ts_sec")).as("t1"))
    val t2 = t1.join(ev.where(col("event_type") === s2), Seq("user_id"))
      .where(col("ts_sec") > col("t1"))
      .groupBy("user_id").agg(min(col("ts_sec")).as("t2"))
    val t3 = t2.join(ev.where(col("event_type") === s3), Seq("user_id"))
      .where(col("ts_sec") > col("t2"))
      .groupBy("user_id").agg(min(col("ts_sec")).as("t3"))
    val n1 = t1.agg(count(lit(1)).as("n_users")).withColumn("step", lit(1))
      .withColumn("event_type", lit(s1))
    val n2 = t2.agg(count(lit(1)).as("n_users")).withColumn("step", lit(2))
      .withColumn("event_type", lit(s2))
    val n3 = t3.agg(count(lit(1)).as("n_users")).withColumn("step", lit(3))
      .withColumn("event_type", lit(s3))
    n1.unionByName(n2).unionByName(n3)
      .select(col("step"), col("event_type"), col("n_users"))
  }

  /** Cohort retention: users are assigned to the cohort of their first
    * active day; for each (cohort_day, day_offset) the number of cohort
    * members active `day_offset` days after joining.
    */
  def retention(events: DataFrame): DataFrame = {
    val day = to_date(col("ts_sec"))
    val active = events.select(col("user_id"), day.as("day")).distinct()
    val cohort = active.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    active
      .join(cohort, Seq("user_id"))
      .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Daily new-user counts with a running cumulative total (cumulative
    * distinct users over time, computed exactly via first-seen days — no
    * per-day distinct-count rescan).
    */
  def cumulativeUsers(events: DataFrame): DataFrame = {
    val firstDay = events
      .groupBy("user_id")
      .agg(min(to_date(col("ts_sec"))).as("day"))
    val w = Window.orderBy("day")
    firstDay
      .groupBy("day")
      .agg(count(lit(1)).as("new_users"))
      .select(col("day"), col("new_users"),
        sum(col("new_users")).over(w).as("cum_users"))
  }
}
