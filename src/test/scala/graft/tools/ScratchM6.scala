package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only m6 stage profiler (the Scratch* family): times synthesize
  * vs decode vs orderBy at a given SF dir, with and without the id
  * spread, printing per-stage wall times.
  */
object ScratchM6 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(".scale/sf1.0")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Multimodal
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val ids = graft.Tables.documents(spark, dir).where(col("doc_id") % 10 === 0)
    for (round <- 1 to 3) {
      println(s"--- round $round")
      time("ids count") { ids.count(): Unit }
      val png = Multimodal.synthesizePng(spark, ids)
      time("synth only (noop)") {
        png.toDF().write.format("noop").mode("overwrite").save()
      }
      val dec = Multimodal.decodePngStats(spark, png)
      time("synth+decode (noop)") {
        dec.toDF().write.format("noop").mode("overwrite").save()
      }
      time("synth+decode+orderBy (noop)") {
        dec.toDF().orderBy("doc_id").write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
