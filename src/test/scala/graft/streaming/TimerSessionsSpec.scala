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

  test("timer expiry exactly AT the watermark fires (pins the <= convention)") {
    // The st14 oracle emits a final session iff ceil-ms(end + gap) <=
    // final watermark. Whether the ENGINE fires a timer whose expiry
    // exactly equals the watermark is a boundary the real fixture's
    // sub-second timestamps essentially never exercise — so pin it here
    // with second-aligned synthetic data: gap 10 s, user 1's expiry lands
    // exactly ON the 10 s watermark (must fire), user 3's lands 1 s past
    // it (must NOT fire).
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val tmp = graft.tools.Scratch.dir("timer-boundary")
    val stage = tmp.resolve("stage")
    Seq(
      (1L, 0L, 1L),             // expiry 0+10s = 10_000 ms == watermark
      (3L, 1_000_000_000L, 3L), // expiry 11_000 ms > watermark
      (2L, 10_000_000_000L, 2L) // watermark driver: max ts = 10 s
    ).toDF("user_id", "ts", "event_id")
      .coalesce(1).write.parquet(stage.toString)
    val part = Files.list(stage).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, tmp.resolve("events.parquet"))

    val out = TimerSessions.closedByTimeout(spark, tmp.toString, gapSeconds = 10L)
      .collect()
    assert(out.length == 1, s"expected exactly user 1's boundary timeout, got: ${out.toSeq}")
    val r = out.head
    assert(r.getAs[Long]("user_id") == 1L)
    assert(r.getAs[String]("closed_by") == "timeout")
    assert(r.getAs[Long]("session_end_ms") == 0L)
    assert(r.getAs[Long]("n_events") == 1L)
  }
}
