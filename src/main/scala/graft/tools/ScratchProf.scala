package graft.tools

import graft.Tables
import graft.operators.{Dedup, SetSimilarityJoin}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage profiler (not part of the driver contract). */
object ScratchProf {
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

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val docs = Tables.documentsParallel(spark, dir)
    val toks = Dedup.shingleRows(docs, 3)
      .select(col("doc_id"), col("shingle").as("term")).distinct()
    time("toks count")(println("  rows=" + toks.count()))
    val toksP = toks.localCheckpoint()
    time("toks checkpoint")(toksP.count())
    val df = toksP.groupBy("term").agg(count(lit(1)).as("df"))
    time("df")(println("  rows=" + df.count()))
    val prefixLen = (col("n_tok") - ceil(lit(0.7) * col("n_tok")).cast("long") + 1).cast("int")
    val prefix = toksP.join(df, Seq("term"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("term")))).as("ts"),
        count(lit(1)).as("n_tok"))
      .select(col("doc_id"), explode(slice(col("ts"), lit(1), prefixLen)).as("t"))
      .select(col("doc_id"), col("t.term").as("term"))
    val prefixP = time("prefix build+checkpoint") { val p = prefix.localCheckpoint(); p.count(); p }
    val cand = prefixP.as("a")
      .join(prefixP.as("b"),
        col("a.term") === col("b.term") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val candP = time("cand") { val c = cand.localCheckpoint(); println("  rows=" + c.count()); c }
    val inter = candP
      .join(toksP.select(col("doc_id").as("doc_a"), col("term")), Seq("doc_a"))
      .join(toksP.select(col("doc_id").as("doc_b"), col("term")), Seq("doc_b", "term"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_inter"))
    time("verify")(println("  rows=" + inter.count()))
    time("full query e2e") {
      SetSimilarityJoin.prefixJaccardJoin(docs, 3, 0.7)
        .write.format("noop").mode("overwrite").save()
    }
    time("full query again") {
      SetSimilarityJoin.prefixJaccardJoin(docs, 3, 0.7)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
