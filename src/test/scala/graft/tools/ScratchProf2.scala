package graft.tools

import graft.Tables
import graft.operators.SetSimilarityJoin
import org.apache.spark.sql.SparkSession

/** Throwaway A/B timing of the full d11/ssj1 queries (warm, median-of-3,
  * noop sink — the bench's measurement protocol).
  */
object ScratchProf2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def dropPinned(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    def bench(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save(); dropPinned() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        dropPinned(); t
      }
      println(f"AB $label%-20s median ${ts.sorted.apply(1)}%6.2f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    val docs = Tables.documentsParallel(spark, dir)
    bench("d11 new")(SetSimilarityJoin.containmentJoin(docs, 3, 0.8))
    bench("ssj1 new")(SetSimilarityJoin.prefixJaccardJoin(docs, 3, 0.7))
    spark.stop()
  }
}
