package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Event-time timers: sessions must close by TIMEOUT (watermark passes
  * last_event + gap) as well as by an in-batch gap — and the two paths
  * must agree with the batch sessionizer on every boundary.
  */
class TimerSessionsSpec extends SparkSpec {

  test("timer-closed + gap-closed sessions partition the batch sessionization") {
    val out = TimerSessions.closedByTimeout(spark, sf0001).collect()
    assert(out.nonEmpty)
    val byKind = out.groupBy(_.getAs[String]("closed_by")).view.mapValues(_.length).toMap
    assert(byKind.getOrElse("gap", 0) > 0, "expected gap-closed sessions")
    assert(byKind.getOrElse("timeout", 0) > 0, "expected timer-closed sessions")

    // batch truth: gap-split sessions; ALL non-final sessions are
    // gap-closed; a final session appears iff its expiry <= watermark
    val batch = graft.operators.Sessionize.sessions(Tables.events(spark, sf0001))
    val nSessions = batch.count()
    val nUsers = batch.select("user_id").distinct().count()
    // every non-final session must be in the output as 'gap'
    assert(byKind("gap").toLong == nSessions - nUsers,
      s"gap-closed ${byKind("gap")} != total ${nSessions} - users $nUsers")

    // no session may be emitted twice (state cleared on timeout)
    val keys = out.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_ms")))
    assert(keys.distinct.length == keys.length, "duplicate session emission")

    // timer closures only for sessions idle >= gap at end of input
    val maxSec = Tables.events(spark, sf0001)
      .agg(max(expr("ts div 1000000000"))).head.getLong(0)
    for (r <- out if r.getAs[String]("closed_by") == "timeout")
      assert(r.getAs[Long]("session_end_ms") / 1000L + 1800L <= maxSec,
        s"premature timeout: $r")
  }
}
