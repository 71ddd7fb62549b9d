package graft.operators

import graft.{SparkSpec, Tables}
import graft.streaming.SessionStream
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ns(sec: Long): Long = sec * 1000000000L

  test("sessions split on gaps > threshold") {
    // user 1: events at 0s, 60s, 4000s (gap > 1800) -> 2 sessions
    // user 2: one event -> 1 session
    val ev = Seq(
      (1L, ns(0), 1L), (1L, ns(60), 2L), (1L, ns(4000), 3L),
      (2L, ns(100), 4L),
    ).toDF("user_id", "ts", "event_id")
    val s = Sessionize.sessions(ev).orderBy("user_id", "session_idx").collect()
    assert(s.length == 3)
    assert(s(0).getAs[Long]("n_events") == 2 && s(0).getAs[Long]("duration_sec") == 60)
    assert(s(1).getAs[Long]("n_events") == 1)
    assert(s(2).getAs[Long]("user_id") == 2L)
  }

  test("streaming sessionizer agrees with batch on session counts") {
    val batch = Sessionize.sessions(Tables.events(spark, sf0001))
      .groupBy("user_id")
      .agg(max(col("session_idx")).as("n_sessions"), sum(col("n_events")).as("n_events"))
      .collect()
      .map(r => r.getAs[Long]("user_id") -> (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events")))
      .toMap
    val stream = SessionStream.userSessions(spark, sf0001)
      .collect()
      .map(r => r.getAs[Long]("user_id") -> (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events")))
      .toMap
    assert(stream.keySet == batch.keySet)
    val diffs = batch.keySet.filter(k => batch(k) != stream(k))
    assert(diffs.isEmpty, s"divergent users: ${diffs.take(5).map(k => (k, batch(k), stream(k)))}")
  }

  test("eventFeatures: correct session-relative columns, one exchange total") {
    val ev = Seq(
      (1L, ns(0), 10L), (1L, ns(60), 11L), (1L, ns(4000), 12L),
      (2L, ns(5), 20L),
    ).toDF("user_id", "ts", "event_id")
    val df = Sessionize.eventFeatures(ev)
    val rows = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows(10L) === ((1L, 1L, 0L)))
    assert(rows(11L) === ((1L, 2L, 60L)))
    assert(rows(12L) === ((2L, 1L, 0L))) // new session after the 4000s gap
    assert(rows(20L) === ((1L, 1L, 0L)))
    // the (user, session) window must reuse the user_id hash partitioning:
    // exactly one shuffle exchange in the FINAL plan (AQE's toString
    // repeats the initial plan below it — don't double-count)
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val shuffles = "(?<!Broadcast)Exchange".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 exchange, plan:\n${plan.take(800)}")
  }
}
