package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** foreachBatch streaming MERGE: micro-batches upsert into a versioned
  * parquet snapshot; the final table must equal the batch-computed
  * latest-row-per-key over everything that was streamed.
  */
class UpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    graft.tools.Scratch.dir(prefix).toString

  private def stream(mem: MemoryStream[(Long, Long, String, Double)]) =
    mem.toDF()
      .toDF("event_id", "user_id", "event_type", "value")
      .withColumn("ts_sec", timestamp_seconds(col("event_id") * 60))

  test("stream of overlapping batches converges to latest-per-key") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Double)]
    val tableDir = tmp("upsert-table")
    val q = stream(mem).writeStream
      .outputMode("update")
      .option("checkpointLocation", tmp("upsert-ckpt"))
      .foreachBatch(UpsertSink.mergeBatch(tableDir, Seq("user_id")) _)
      .start()
    try {
      // batch 1: users 1, 2 — batch 2 overwrites user 1, adds 3 —
      // batch 3 has TWO rows for user 2 (latest within batch must win)
      mem.addData((1L, 1L, "a", 1.0), (2L, 2L, "b", 2.0))
      q.processAllAvailable()
      mem.addData((3L, 1L, "c", 3.0), (4L, 3L, "d", 4.0))
      q.processAllAvailable()
      mem.addData((5L, 2L, "e", 5.0), (6L, 2L, "f", 6.0))
      q.processAllAvailable()
    } finally q.stop()

    val snap = UpsertSink.loadSnapshot(spark, tableDir).get
      .select("user_id", "event_id", "event_type", "value")
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(snap.toSeq === Seq(
      (1L, 3L, "c", 3.0),
      (2L, 6L, "f", 6.0),
      (3L, 4L, "d", 4.0),
    ))
    // three committed versions exist (one per non-empty batch)
    val vs = new java.io.File(tableDir).list().count(_.matches("v\\d+-b\\d+"))
    assert(vs === 3, s"expected 3 snapshot versions, got $vs")
  }

  test("crash-replay of a committed batch is skipped (no duplicate version)") {
    val tableDir = tmp("upsert-table3")
    val batch = Seq((1L, 1L, "a", 1.0))
      .toDF("event_id", "user_id", "event_type", "value")
      .withColumn("ts_sec", timestamp_seconds(col("event_id") * 60))
    UpsertSink.mergeBatch(tableDir, Seq("user_id"))(batch, 0L)
    // foreachBatch re-delivers batch 0 after a crash before the offset
    // commit: the snapshot already contains it, so nothing may change
    UpsertSink.mergeBatch(tableDir, Seq("user_id"))(batch, 0L)
    val vs = new java.io.File(tableDir).list().count(_.matches("v\\d+-b\\d+"))
    assert(vs === 1, s"replayed batch must not add a version, got $vs")
    // a NEW batch still advances the version
    UpsertSink.mergeBatch(tableDir, Seq("user_id"))(
      batch.withColumn("event_id", col("event_id") + 1), 1L)
    val vs2 = new java.io.File(tableDir).list().count(_.matches("v\\d+-b\\d+"))
    assert(vs2 === 2)
  }

  test("runToTable single shot + idle restart adds no version") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Double)]
    val tableDir = tmp("upsert-table2")
    val ckpt = tmp("upsert-ckpt2")
    mem.addData((1L, 1L, "a", 1.0))
    val snap = UpsertSink.runToTable(stream(mem), tableDir, Seq("user_id"), ckpt)
    assert(snap.count() === 1)
    // second run from the same checkpoint: no new data ⇒ no new version
    UpsertSink.runToTable(stream(mem), tableDir, Seq("user_id"), ckpt)
    val vs = new java.io.File(tableDir).list().count(_.matches("v\\d+-b\\d+"))
    assert(vs === 1, s"expected 1 snapshot version after idle restart, got $vs")
  }
}
