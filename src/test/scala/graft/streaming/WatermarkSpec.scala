package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Event-time semantics under watermarking, driven batch-by-batch with a
  * MemoryStream: append mode emits a window only once the watermark
  * passes its end, and events arriving later than the watermark are
  * dropped — the late-data contract the 100 TB streaming path relies on.
  */
class WatermarkSpec extends SparkSpec {
  import spark.implicits._

  test("append mode: windows emit when watermark passes; late events dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val counts = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("k"))
      .agg(count(lit(1)).as("n"))

    val q = counts.writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName("wm_spec")
      .start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")
    try {
      // batch 1: two events in hour-0
      input.addData((ts(5), "a"), (ts(20), "a"))
      q.processAllAvailable()
      assert(spark.table("wm_spec").count() == 0) // hour-0 window still open

      // batch 2: event at 02:00 -> watermark = 01:50 -> hour-0 closes
      input.addData((ts(120), "a"))
      q.processAllAvailable()
      val emitted = spark.table("wm_spec").collect()
      assert(emitted.length == 1 && emitted.head.getAs[Long]("n") == 2)

      // batch 3: a LATE hour-0 event (behind the 01:50 watermark) is dropped
      input.addData((ts(30), "a"))
      q.processAllAvailable()
      assert(spark.table("wm_spec").count() == 1) // no re-emit, no new row

      // batch 4: advance far enough to close hour-2; the late event never counted
      input.addData((ts(300), "a"))
      q.processAllAvailable()
      val all = spark.table("wm_spec").collect()
        .map(r => r.getAs[org.apache.spark.sql.Row]("window").getAs[java.sql.Timestamp](0).toString -> r.getAs[Long]("n"))
        .toMap
      assert(all("2024-01-01 00:00:00.0") == 2) // late event at 00:30 was NOT added
      assert(all("2024-01-01 02:00:00.0") == 1)
    } finally q.stop()
  }
}
