package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Stateful-stream recovery: a dropDuplicates query stopped and
  * restarted from its checkpoint must keep its dedup state — no
  * duplicates emitted across the restart, no rows lost. This is the
  * exactly-once contract a long-lived 100 TB ingest pipeline leans on
  * (driver crash ≠ duplicate documents downstream).
  */
class CheckpointRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("dropDuplicates state survives a query restart from checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = graft.tools.Scratch.dir("ckpt").toString
    val sink = graft.tools.Scratch.dir("sink").toString

    def startQuery(input: MemoryStream[(Long, String)]) =
      input.toDF().toDF("id", "payload")
        .dropDuplicates("id")
        .writeStream
        .outputMode(OutputMode.Append())
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .start()

    // One source across both runs: a restart resumes from the recorded
    // source OFFSET, so the replacement query must see a source whose
    // offsets continue where the checkpoint left off (with a brand-new
    // MemoryStream the post-restart batches would alias already-committed
    // offsets and be skipped entirely).
    val input = MemoryStream[(Long, String)]

    // run 1: ids 1,2,3 (3 duplicated in-batch)
    val q1 = startQuery(input)
    try {
      input.addData((1L, "a"), (2L, "b"), (3L, "c"), (3L, "c2"))
      q1.processAllAvailable()
    } finally q1.stop()

    // run 2: NEW query object, SAME checkpoint; ids 2,3 are duplicates
    // from before the restart and must be suppressed by the recovered
    // state store
    input.addData((2L, "dup"), (3L, "dup"), (4L, "d"), (5L, "e"))
    val q2 = startQuery(input)
    try q2.processAllAvailable()
    finally q2.stop()

    val out = spark.read.parquet(sink).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(1L, 2L, 3L, 4L, 5L),
      s"state lost or duplicated across restart: $out")
  }
}
