package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.DataQuality
import org.apache.spark.sql.functions._

/** st24's merge law, exercised with REAL multi-batch streaming: the
  * single-file fixture source always drives one micro-batch, so the
  * foreachBatch census-merge path would otherwise ship untested. Here
  * the corpus is split across three parquet files and driven at
  * maxFilesPerTrigger=1 — three genuine micro-batches — and the merged
  * census must equal the one-shot batch census exactly (counts and
  * sums are associative; anything else is a merge bug).
  */
class StreamQualityGateSpec extends SparkSpec {

  private def batchCensus(docs: org.apache.spark.sql.DataFrame) =
    DataQuality.gopherMetrics(docs)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        expr("count_if(gopher_pass)").as("n_pass"),
        sum(when(col("gopher_pass"), col("n_words")).otherwise(0L))
          .as("pass_words"))
      .orderBy("source")
      .collect().toSeq

  test("three micro-batches merge to exactly the batch census") {
    val docs = Tables.documents(spark, sf0001)
    val dir = graft.tools.Scratch.dir("gate3").toString
    // three guaranteed files: one explicit single-file write per slice
    // (hash repartition can collide residues into one partition)
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
    val files = new java.io.File(s"$dir/chunks").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 3, s"need 3 files, got ${files.length}")

    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/chunks")
    val streamed = DocsStream.gateDrive(spark, stream).collect().toSeq

    assert(streamed == batchCensus(docs),
      "multi-batch merged census diverged from the batch census")
    assert(streamed.nonEmpty)
  }

  test("a retried micro-batch (same batchId) merges exactly once") {
    val docs = Tables.documents(spark, sf0001)
    val root = graft.tools.Scratch.dir("gate-retry")
      .toString + "/census.parquet"
    val b0 = docs.where(col("doc_id") % 2 === 0)
    val b1 = docs.where(col("doc_id") % 2 === 1)

    assert(DocsStream.mergeCensus(spark, root, b0, 0L), "first delivery merges")
    val after0 = graft.energy.AtomicLayer.read(spark, root)
      .drop("_merged_batch_id").orderBy("source").collect().toSeq
    // foreachBatch is at-least-once: the SAME batch redelivered must be a
    // no-op, not a double-count
    assert(!DocsStream.mergeCensus(spark, root, b0, 0L), "retry must skip")
    val afterRetry = graft.energy.AtomicLayer.read(spark, root)
      .drop("_merged_batch_id").orderBy("source").collect().toSeq
    assert(afterRetry == after0, "retried batch double-counted")

    assert(DocsStream.mergeCensus(spark, root, b1, 1L), "next batch merges")
    val merged = graft.energy.AtomicLayer.read(spark, root)
      .drop("_merged_batch_id").orderBy("source").collect().toSeq
    assert(merged == batchCensus(docs),
      "retry-safe merge diverged from the batch census")
  }

  test("an empty first micro-batch commits a 0-row snapshot without poisoning the guard") {
    val docs = Tables.documents(spark, sf0001)
    val root = graft.tools.Scratch.dir("gate-empty")
      .toString + "/census.parquet"
    val empty = docs.where(lit(false))

    // batch 0 is empty (a real occurrence: trigger fires before any file
    // lands) — it commits a 0-row census whose max(_merged_batch_id) is
    // NULL; the NEXT batch's guard must read that null-safely, not NPE
    assert(DocsStream.mergeCensus(spark, root, empty, 0L), "empty batch commits")
    assert(DocsStream.mergeCensus(spark, root, docs, 1L),
      "guard over a 0-row snapshot must not crash and must merge")
    val merged = graft.energy.AtomicLayer.read(spark, root)
      .drop("_merged_batch_id").orderBy("source").collect().toSeq
    assert(merged == batchCensus(docs),
      "census after an empty leading batch diverged from the batch census")
  }
}
