package graft.tools

import graft.Tables
import graft.operators.Contamination
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway sub-stage profiler for removeDuplicateSpans (tm2's cost
  * center). Re-derives the operator's internal relations stage by
  * stage so each can be timed in isolation (noop sink, post-warmup).
  */
object ScratchProfTm2 {
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
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      f
      val t0 = System.nanoTime(); f
      println(f"PROF $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    val docs = Tables.documentsParallel(spark, dir)
    val wins = Contamination.spanHashes(docs, keepPos = true)
    val hstats = wins.select("h", "doc_id").distinct()
      .groupBy("h").agg(count(lit(1)).as("nd"), min("doc_id").as("first_doc"))
      .where(col("nd") >= 2L)
    val dupWins = wins.join(hstats, Seq("h"))
      .select(col("doc_id"), col("p").as("s"), (col("p") + 31L).as("e"))
    val byStart = Window.partitionBy("doc_id").orderBy("s")
    val prevMaxE = max(col("e"))
      .over(byStart.rowsBetween(Window.unboundedPreceding, -1))
    val merged = dupWins
      .withColumn("brk",
        when(prevMaxE.isNull || col("s") > prevMaxE + 1L, 1L).otherwise(0L))
      .withColumn("island",
        sum(col("brk")).over(byStart.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "island")
      .agg(min("s").as("s"), max("e").as("e"))

    time("1 wins") { sink(wins) }
    time("2 hstats") { sink(hstats) }
    time("3 dupWins join") { sink(dupWins) }
    time("4 merged islands") { sink(merged) }
    time("5 rds total") { sink(Contamination.removeDuplicateSpans(docs)) }
    time("6 tm2 full") { sink(graft.SparkEntry.queries("tm2_clean_corpus")(spark, dir)) }
    spark.stop()
  }
}
object ScratchProfTm2b {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
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
    import org.apache.spark.sql.functions._
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      f
      val t0 = System.nanoTime(); f
      println(f"PROF $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    val docs = graft.Tables.documentsParallel(spark, dir)
    time("gopher on raw (new shape)") {
      sink(graft.operators.DataQuality.gopherMetrics(docs.select(col("doc_id"), col("text"))))
    }
    val cleaned = graft.operators.Contamination.removeDuplicateSpans(docs)
      .select(col("doc_id"), col("clean_text").as("text"))
    time("cleaned+gopher (incl rds)") {
      sink(graft.operators.DataQuality.gopherMetrics(
        cleaned.where(length(col("text")) >= 32).select("doc_id", "text")))
    }
    spark.stop()
  }
}
