package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** flatMapGroupsWithState (Append, multi-row emission) agrees with
  * mapGroupsWithState (Update, snapshot) on the same stream: per user,
  * closed sessions = total sessions − the one still open in state.
  */
class ClosedSessionsSpec extends SparkSpec {

  test("closed sessions = snapshot session count minus the open tail") {
    val closed = SessionStream.closedSessions(spark, sf0001)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_closed"))
    val snapshot = SessionStream.userSessions(spark, sf0001)
      .select(col("user_id"), col("n_sessions"))
    val joined = snapshot.join(closed, Seq("user_id"), "left")
      .select(
        col("user_id"),
        col("n_sessions"),
        coalesce(col("n_closed"), lit(0L)).as("n_closed"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getLong(2) === r.getLong(1) - 1L,
        s"user ${r.getLong(0)}: ${r.getLong(2)} closed vs ${r.getLong(1)} total")
    }
  }

  test("every closed session is well-formed") {
    val rows = SessionStream.closedSessions(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (start, end, n) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(start <= end && n >= 1L)
    }
  }
}
