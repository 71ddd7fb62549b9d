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
    val batch = Sessionize.sessions(Tables.t(spark, sf0001, "events"))
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
}
