package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.Scd2
import org.apache.spark.sql.functions._

/** st25's merge law: the streamed SCD-2 dimension must converge to the
  * one-shot batch history REGARDLESS of micro-batching — including
  * out-of-order arrival of a user's versions across batches (the merge
  * replays affected users' versions back to change events and
  * re-windows), same-batch retries (batchId guard), and cross-batch
  * redelivery of an already-merged event (event_id dedup).
  */
class StreamScd2Spec extends SparkSpec {

  private def signups = Tables.events(spark, sf0001)
    .where(col("event_type") === "signup")
    .select(col("user_id"), col("event_id"), col("ts_sec"), col("value"))

  private def batchHistory = Scd2
    .buildHistory(signups, col("user_id"), col("ts_sec"), col("event_id"))
    .select("user_id", "version", "event_id", "value",
      "effective_from", "effective_to", "is_current")
    .orderBy("user_id", "version").collect().toSeq

  private def dimAt(root: String) =
    graft.energy.AtomicLayer.read(spark, root).drop("_merged_batch_id")
      .select("user_id", "version", "event_id", "value",
        "effective_from", "effective_to", "is_current")
      .orderBy("user_id", "version").collect().toSeq

  test("out-of-order micro-batches converge to the batch history") {
    val root = graft.tools.Scratch.dir("scd2-ooo").toString + "/dim.parquet"
    // split by event_id parity: each user's versions interleave across
    // the two batches, so batch 1 delivers versions OLDER than some
    // already-merged ones — the recompute-per-affected-key merge must
    // re-window them into place
    val b0 = signups.where(col("event_id") % 2 === 0)
    val b1 = signups.where(col("event_id") % 2 === 1)
    assert(EventsStream.mergeScd2(spark, root, b0, 0L))
    assert(EventsStream.mergeScd2(spark, root, b1, 1L))
    assert(dimAt(root) == batchHistory,
      "streamed merge diverged from the one-shot batch history")
  }

  test("a retried micro-batch is a no-op; cross-batch redelivery dedupes") {
    val root = graft.tools.Scratch.dir("scd2-retry").toString + "/dim.parquet"
    val b0 = signups.where(col("event_id") % 2 === 0)
    val b1 = signups.where(col("event_id") % 2 === 1)
    assert(EventsStream.mergeScd2(spark, root, b0, 0L))
    // same-batch retry: guard blocks the merge entirely
    assert(!EventsStream.mergeScd2(spark, root, b0, 0L), "retry must skip")
    // cross-batch redelivery: batch 1 re-carries all of batch 0's events
    // (at-least-once source); event_id dedup must keep history exact
    assert(EventsStream.mergeScd2(spark, root, b0.unionByName(b1), 1L))
    assert(dimAt(root) == batchHistory,
      "cross-batch redelivery double-counted a version")
  }

  test("REAL multi-batch stream (maxFilesPerTrigger=1) equals the batch history") {
    val dir = graft.tools.Scratch.dir("scd2-files").toString
    for (r <- 0 until 3) {
      val scratch = s"$dir/scratch$r"
      signups.where(col("event_id") % 3 === r).coalesce(1)
        .write.parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$dir/chunks"))
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/chunks/slice$r.parquet"))
    }
    val stream = spark.readStream
      .schema(signups.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/chunks")
    val streamed = EventsStream.scd2Drive(spark, stream).collect().toSeq
    assert(streamed == batchHistory,
      "multi-batch streamed dim diverged from the batch history")
    assert(streamed.nonEmpty)
  }
}
