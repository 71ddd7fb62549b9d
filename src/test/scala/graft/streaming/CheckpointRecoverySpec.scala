package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Stateful-stream recovery: a dropDuplicates query stopped and
  * restarted from its checkpoint must keep its dedup state — no
  * duplicates emitted across the restart, no rows lost. This is the
  * exactly-once contract a long-lived 100 TB ingest pipeline leans on
  * (driver crash ≠ duplicate documents downstream).
  */
class CheckpointRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("dropDuplicates state survives a query restart from checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = graft.tools.Scratch.dir("ckpt").toString
    val sink = graft.tools.Scratch.dir("sink").toString

    def startQuery(input: MemoryStream[(Long, String)]) =
      input.toDF().toDF("id", "payload")
        .dropDuplicates("id")
        .writeStream
        .outputMode(OutputMode.Append())
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .start()

    // One source across both runs: a restart resumes from the recorded
    // source OFFSET, so the replacement query must see a source whose
    // offsets continue where the checkpoint left off (with a brand-new
    // MemoryStream the post-restart batches would alias already-committed
    // offsets and be skipped entirely).
    val input = MemoryStream[(Long, String)]

    // run 1: ids 1,2,3 (3 duplicated in-batch)
    val q1 = startQuery(input)
    try {
      input.addData((1L, "a"), (2L, "b"), (3L, "c"), (3L, "c2"))
      q1.processAllAvailable()
    } finally q1.stop()

    // run 2: NEW query object, SAME checkpoint; ids 2,3 are duplicates
    // from before the restart and must be suppressed by the recovered
    // state store
    input.addData((2L, "dup"), (3L, "dup"), (4L, "d"), (5L, "e"))
    val q2 = startQuery(input)
    try q2.processAllAvailable()
    finally q2.stop()

    val out = spark.read.parquet(sink).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(1L, 2L, 3L, 4L, 5L),
      s"state lost or duplicated across restart: $out")
  }

  test("st27 drift gate survives a restart: merged census equals the batch census") {
    // VERDICT r12 #7: the drift state lives in an AtomicLayer relation
    // merged by foreachBatch (not the engine's state store), so restart
    // safety rests on TWO of our own contracts — the checkpoint resumes
    // source offsets, and the _merged_batch_id guard makes a replayed
    // uncommitted batch a no-op. Kill the query between batches and
    // prove batching-invariance holds ACROSS the restart.
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = graft.tools.Scratch.dir("drift-restart-ckpt").toString
    val root = graft.tools.Scratch.dir("drift-restart").toString +
      "/term_counts.parquet"
    val input = MemoryStream[(String, String)]
    def start() = input.toDF().toDF("source", "text").writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .foreachBatch((b: DataFrame, id: Long) =>
        DocsStream.mergeTermCounts(spark, root, b, id): Unit)
      .start()

    val run1 = Seq(("web", "alpha beta beta"), ("book", "gamma alpha"))
    val run2 = Seq(("web", "beta delta"), ("book", "gamma gamma epsilon"))
    val q1 = start()
    try { input.addData(run1: _*); q1.processAllAvailable() } finally q1.stop()
    // replayed-batch adjudication: restart may redeliver the last batch
    // with its original id — the guard must refuse to double-count
    val lastId = graft.energy.AtomicLayer.lastMergedBatch(spark, root)
    assert(!DocsStream.mergeTermCounts(spark, root,
        spark.createDataFrame(run1).toDF("source", "text"), lastId),
      "a replayed batch id must be a merge no-op")
    val q2 = start()
    try { input.addData(run2: _*); q2.processAllAvailable() } finally q2.stop()

    val got = graft.operators.TextAnalysis.totalVariationBySource(
        graft.energy.AtomicLayer.read(spark, root).drop("_merged_batch_id"))
      .orderBy("source").collect().toSeq
    val batchCounts = spark.createDataFrame(run1 ++ run2).toDF("source", "text")
      .select(col("source"),
        explode(graft.operators.TextAnalysis.words(col("text"))).as("term"))
      .where(col("term") =!= "")
      .groupBy("source", "term").agg(count(lit(1)).as("cs"))
    val want = graft.operators.TextAnalysis.totalVariationBySource(batchCounts)
      .orderBy("source").collect().toSeq
    assert(got == want,
      s"restart broke the census merge law:\n got=$got\nwant=$want")
  }

  test("st29 graph-index ingest survives a restart: artifact equals the one-shot insert") {
    // The graph ingest's restart contract is the same division of labor:
    // engine checkpoint resumes offsets, the id-keyed idempotent insert
    // absorbs a redelivered batch. A query killed between micro-batches
    // and restarted from its checkpoint must leave edges byte-identical
    // to the single-run insert of all vectors (the GraphIndexSpec
    // batching-invariance law, now proven across a real restart).
    import graft.Tables
    import graft.operators.Similarity
    import graft.energy.AtomicLayer
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.embeddings(spark, sf0001)
    val old = emb.where(col("vec_id") < 100)
    val nw = emb.where(col("vec_id") >= 100 && col("vec_id") < 130)

    // one-shot reference artifact
    val refRoot = graft.tools.Scratch.dir("graph-restart").toString + "/ref"
    Similarity.buildNndGraphIndex(old, refRoot)
    Similarity.freezeGraphIndexBase(spark, refRoot)
    Similarity.streamInsertIntoGraphIndex(old, nw, refRoot)
    val ref = AtomicLayer.read(spark, s"$refRoot/edges.parquet")
      .orderBy("v", "rank").collect().toSeq

    // streamed with a kill/restart between the two micro-batches
    val root = graft.tools.Scratch.dir("graph-restart").toString + "/live"
    Similarity.buildNndGraphIndex(old, root)
    Similarity.freezeGraphIndexBase(spark, root)
    val rows = nw.select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val ckpt = graft.tools.Scratch.dir("graph-restart-ckpt").toString
    val input = MemoryStream[(Long, Seq[Float])]
    def start() = input.toDF().toDF("vec_id", "embedding").writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .foreachBatch((b: DataFrame, _: Long) =>
        if (!b.isEmpty) Similarity.streamInsertIntoGraphIndex(old, b, root))
      .start()
    val (half1, half2) = rows.splitAt(rows.length / 2)
    val q1 = start()
    try { input.addData(half1.toSeq: _*); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try { input.addData(half2.toSeq: _*); q2.processAllAvailable() } finally q2.stop()

    val got = AtomicLayer.read(spark, s"$root/edges.parquet")
      .orderBy("v", "rank").collect().toSeq
    assert(got == ref,
      "edges after a mid-stream restart must equal the one-shot artifact")
  }
}
