package graft.tools

import graft.Tables
import graft.operators.{Contamination, DataQuality, Dedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Bisect tm2's composition after the map-only gopher rewrite. */
object ScratchProfTm2c {
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
    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      sink(mk)
      val t0 = System.nanoTime(); sink(mk)
      println(f"PROF $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    val docsRaw = Tables.documentsParallel(spark, dir)
    def cleanedMk = Contamination.removeDuplicateSpans(docsRaw)
      .select(col("doc_id"), col("clean_text").as("text"))
      .join(docsRaw.select(col("doc_id"), col("source"),
        col("n_chars").as("n_chars_input")), Seq("doc_id"))
      .localCheckpoint(eager = false)
    time("a cleaned only") { cleanedMk }
    time("b ne=len>=32") { cleanedMk.where(length(col("text")) >= 32) }
    time("c gopher(ne)") {
      val ne = cleanedMk.where(length(col("text")) >= 32).localCheckpoint(eager = false)
      DataQuality.gopherMetrics(ne.select(col("doc_id"), col("text")))
    }
    time("d gopher(ne).where(pass)") {
      val ne = cleanedMk.where(length(col("text")) >= 32).localCheckpoint(eager = false)
      DataQuality.gopherMetrics(ne.select(col("doc_id"), col("text")))
        .where(col("gopher_pass")).select("doc_id")
    }
    time("e fin join") {
      val ne = cleanedMk.where(length(col("text")) >= 32).localCheckpoint(eager = false)
      ne.join(
        DataQuality.gopherMetrics(ne.select(col("doc_id"), col("text")))
          .where(col("gopher_pass")).select("doc_id"),
        Seq("doc_id"))
    }
    time("f census on fin") {
      val ne = cleanedMk.where(length(col("text")) >= 32).localCheckpoint(eager = false)
      val fin = ne.join(
        DataQuality.gopherMetrics(ne.select(col("doc_id"), col("text")))
          .where(col("gopher_pass")).select("doc_id"),
        Seq("doc_id"))
      fin.groupBy("source").agg(
        count(lit(1)).as("n_final"),
        sum(length(col("text")).cast(LongType)).as("chars_final"),
        sum(Dedup.portableHash60(col("text")) % lit(1000003L)).as("clean_digest"))
    }
    spark.stop()
  }
}
