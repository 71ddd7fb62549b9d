package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** st19's load-bearing property, stated directly: the max_by CDC state
  * converges to the same serving table whatever order the change events
  * arrive in across micro-batches — including a LATE batch carrying an
  * event that is older than state already applied, and a late tombstone
  * that must retract an already-served key.
  */
class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  private case class Ev(user_id: Long, ts: Long, event_id: Long,
      event_type: String, value: Double)

  private def serve(name: String): Map[Long, Long] =
    spark.table(name)
      .groupBy("user_id")
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
        col("value"))).as("s"))
      .where(col("s.event_type") =!= "error")
      .select(col("user_id"),
        floor(col("s.value") * 100).cast("long").as("bal_cents"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("cdc state converges regardless of cross-batch arrival order") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val latest = input.toDF()
      .groupBy("user_id")
      .agg(max_by(
        struct(col("ts"), col("event_id"), col("event_type"), col("value")),
        struct(col("ts"), col("event_id"))).as("s"))
      .select(col("user_id"), col("s.ts").as("ts"),
        col("s.event_id").as("event_id"),
        col("s.event_type").as("event_type"), col("s.value").as("value"))
    val q = latest.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("cdc_ooo").start()
    try {
      // batch 1: the NEWEST events arrive first
      input.addData(
        Ev(1L, 900L, 9L, "purchase", 7.0), // user 1 final winner
        Ev(2L, 900L, 8L, "error", 0.0))    // user 2 final = tombstone
      q.processAllAvailable()
      // batch 2 arrives LATE with strictly older events — state must not
      // regress (user 1 stays at 7.0; user 2 stays tombstoned), and a
      // brand-new key applies normally
      input.addData(
        Ev(1L, 100L, 1L, "view", 1.0),
        Ev(2L, 100L, 2L, "purchase", 2.0),
        Ev(3L, 100L, 3L, "purchase", 3.5))
      q.processAllAvailable()
    } finally q.stop()
    val table = serve("cdc_ooo")
    assert(table == Map(1L -> 700L, 3L -> 350L),
      s"state regressed under out-of-order arrival: $table")
  }
}
