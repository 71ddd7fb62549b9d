package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** st27's merge law, exercised with REAL multi-batch streaming (same
  * discipline as StreamQualityGateSpec): the corpus split across three
  * parquet files driven at maxFilesPerTrigger=1 must yield the exact
  * batch total-variation census — per-(source, term) counts are
  * associative, so any divergence is a merge bug, not noise.
  */
class StreamDriftSpec extends SparkSpec {

  private def batchTv(docs: org.apache.spark.sql.DataFrame) =
    TextAnalysis.totalVariationBySource(
        docs.select(col("source"),
            explode(TextAnalysis.words(col("text"))).as("term"))
          .where(col("term") =!= "")
          .groupBy("source", "term").agg(count(lit(1)).as("cs")))
      .orderBy("source")
      .collect().toSeq

  test("three micro-batches merge to exactly the batch TV census") {
    val docs = Tables.documents(spark, sf0001)
    val dir = graft.tools.Scratch.dir("drift3").toString
    for (r <- 0 until 3) {
      val scratch = s"$dir/scratch$r"
      docs.where(col("doc_id") % 3 === r).coalesce(1)
        .write.parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$dir/chunks"))
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/chunks/slice$r.parquet"))
    }
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/chunks")
    val streamed = DocsStream.driftDrive(spark, stream).collect().toSeq

    assert(streamed == batchTv(docs),
      "multi-batch merged TV census diverged from the batch census")
    assert(streamed.nonEmpty)
  }

  test("a retried micro-batch (same batchId) merges term counts exactly once") {
    val docs = Tables.documents(spark, sf0001)
    val root = graft.tools.Scratch.dir("drift-retry")
      .toString + "/term_counts.parquet"
    val b0 = docs.where(col("doc_id") % 2 === 0)
    val b1 = docs.where(col("doc_id") % 2 === 1)

    assert(DocsStream.mergeTermCounts(spark, root, b0, 0L), "first delivery merges")
    val after0 = graft.energy.AtomicLayer.read(spark, root)
      .drop("_merged_batch_id").orderBy("source", "term").collect().toSeq
    assert(!DocsStream.mergeTermCounts(spark, root, b0, 0L), "retry must skip")
    val afterRetry = graft.energy.AtomicLayer.read(spark, root)
      .drop("_merged_batch_id").orderBy("source", "term").collect().toSeq
    assert(afterRetry == after0, "retried batch double-counted")

    assert(DocsStream.mergeTermCounts(spark, root, b1, 1L), "next batch merges")
    val mergedTv = TextAnalysis.totalVariationBySource(
        graft.energy.AtomicLayer.read(spark, root).drop("_merged_batch_id"))
      .orderBy("source").collect().toSeq
    assert(mergedTv == batchTv(docs),
      "retry-safe merge diverged from the batch TV census")
  }
}
