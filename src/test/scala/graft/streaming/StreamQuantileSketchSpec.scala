package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** st28's merge law, exercised with REAL multi-batch streaming (the
  * StreamDriftSpec discipline): three genuine micro-batches must
  * converge to exactly the batch bottom-256 sketch, and — the property
  * specific to min-k state — a RETRIED batch is a no-op even without
  * the guard, because min-k merge is idempotent by construction.
  */
class StreamQuantileSketchSpec extends SparkSpec {

  private def batchSketch(ev: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val s = ev.select(
        floor(col("value") * 100).cast("long").as("cents"),
        graft.operators.Dedup.portableHash60(
          concat(lit("qsk2:"), col("event_id"))).as("h"))
      .orderBy(col("h"), col("cents")).limit(256)
    val ranked = s.withColumn("rk",
      row_number().over(Window.orderBy(col("cents"), col("h"))))
    def os(q: Double, name: String) =
      max(when(col("rk") ===
        ceil(col("kk") * lit(q)).cast("long"), col("cents"))).as(name)
    ranked.crossJoin(broadcast(ranked.agg(count(lit(1)).as("kk"))))
      .agg(max(col("kk")).as("k_sample"), os(0.25, "p25_est"),
        os(0.5, "p50_est"), os(0.75, "p75_est"), os(0.9, "p90_est"))
      .collect().toSeq
  }

  test("three micro-batches merge to exactly the batch bottom-k sketch") {
    val ev = Tables.events(spark, sf0001)
    val dir = graft.tools.Scratch.dir("qsketch3").toString
    for (r <- 0 until 3) {
      val scratch = s"$dir/scratch$r"
      ev.where(col("event_id") % 3 === r).coalesce(1)
        .write.parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$dir/chunks"))
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/chunks/slice$r.parquet"))
    }
    val stream = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/chunks")
    val streamed = EventsStream.sketchDrive(spark, stream).collect().toSeq
    assert(streamed == batchSketch(ev),
      "multi-batch merged sketch diverged from the batch bottom-256")
  }

  test("min-k merge is idempotent: re-merging the same batch is a no-op") {
    val ev = Tables.events(spark, sf0001)
    val root = graft.tools.Scratch.dir("qsketch-retry")
      .toString + "/sketch.parquet"
    val b0 = ev.where(col("event_id") % 2 === 0)
    assert(EventsStream.mergeSketch(spark, root, b0, 0L), "first delivery merges")
    val after0 = graft.energy.AtomicLayer.read(spark, root)
      .drop("_merged_batch_id").orderBy("h", "cents").collect().toSeq
    // the guard skips the retry...
    assert(!EventsStream.mergeSketch(spark, root, b0, 0L), "guard skips retry")
    // ...but even FORCING the merge with a fresh batchId (as if the
    // guard were absent) must not change the state: min-k of a set
    // united with its own elements is itself.
    assert(EventsStream.mergeSketch(spark, root, b0, 1L), "forced re-merge runs")
    val afterForced = graft.energy.AtomicLayer.read(spark, root)
      .drop("_merged_batch_id").orderBy("h", "cents").collect().toSeq
    assert(afterForced == after0, "min-k re-merge changed the state")
    // and completing with the other half converges to the batch sketch
    assert(EventsStream.mergeSketch(spark, root,
      ev.where(col("event_id") % 2 === 1), 2L))
    val sk = graft.energy.AtomicLayer.read(spark, root)
      .drop("_merged_batch_id").orderBy("h", "cents")
      .collect().toSeq
    val want = ev.select(
        floor(col("value") * 100).cast("long").as("cents"),
        graft.operators.Dedup.portableHash60(
          concat(lit("qsk2:"), col("event_id"))).as("h"))
      .orderBy(col("h"), col("cents")).limit(256)
      .select("cents", "h").orderBy("h", "cents").collect().toSeq
    assert(sk.map(r => (r.getLong(0), r.getLong(1))) ==
      want.map(r => (r.getLong(0), r.getLong(1))),
      "converged state is not the batch bottom-256")
  }
}
