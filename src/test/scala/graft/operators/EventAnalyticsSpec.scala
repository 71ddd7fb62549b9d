package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.toDF("user_id", "event_type", "s")
      .select(col("user_id"), col("event_type"),
        to_timestamp(col("s")).as("ts_sec"))

  test("funnel3: steps must occur in strict temporal order") {
    val events = ev(
      // user 1 completes the funnel in order
      (1L, "view", "2024-01-01 00:00:00"),
      (1L, "click", "2024-01-01 01:00:00"),
      (1L, "purchase", "2024-01-01 02:00:00"),
      // user 2 clicks BEFORE viewing — click doesn't count, purchase
      // can't qualify either (no click after view)
      (2L, "click", "2024-01-02 00:00:00"),
      (2L, "view", "2024-01-02 01:00:00"),
      (2L, "purchase", "2024-01-02 02:00:00"),
      // user 3 views only
      (3L, "view", "2024-01-03 00:00:00"),
    )
    val out = EventAnalytics.funnel3(events, "view", "click", "purchase")
      .orderBy("step")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (1, "view", 3L), (2, "click", 1L), (3, "purchase", 1L)))
  }

  test("funnel3: equal timestamps do not advance the funnel (strict >)") {
    val events = ev(
      (1L, "view", "2024-01-01 00:00:00"),
      (1L, "click", "2024-01-01 00:00:00"),
    )
    val out = EventAnalytics.funnel3(events, "view", "click", "purchase")
      .orderBy("step").collect().map(_.getLong(2))
    assert(out.toSeq === Seq(1L, 0L, 0L))
  }

  test("retention: offsets count from each user's first active day") {
    val events = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-03 10:00:00"), // offset 2
      (2L, "view", "2024-01-01 11:00:00"),
      (2L, "view", "2024-01-01 12:00:00"),  // same day: one active row
      (3L, "view", "2024-01-03 09:00:00"),  // second cohort
    )
    val out = EventAnalytics.retention(events)
      .orderBy("cohort_day", "day_offset")
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("2024-01-01", 0, 2L), ("2024-01-01", 2, 1L), ("2024-01-03", 0, 1L)))
  }

  test("cumulativeUsers: running total equals overall distinct users") {
    val events = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (2L, "view", "2024-01-01 11:00:00"),
      (1L, "view", "2024-01-02 10:00:00"), // not new on day 2
      (3L, "view", "2024-01-02 11:00:00"),
    )
    val out = EventAnalytics.cumulativeUsers(events)
      .orderBy("day")
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("2024-01-01", 2L, 2L), ("2024-01-02", 1L, 3L)))
  }
}
