package graft.streaming

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming face of the similarity-search tier: query vectors arrive as
  * a stream and are scored ONLINE against the static corpus index — the
  * serving shape of a vector store (ingest-side indexing is the batch
  * tier; this is the lookup path as a continuous query).
  */
object VectorStream {
  private val runId = new AtomicInteger(0)

  /** Streaming nearest neighbor (top-1) via LSH candidates: each
    * streamed query vector hashes to its OR-construction buckets
    * map-side (the native LshBuckets kernel — no state, no shuffle of
    * the stream), joins the static corpus's bucket table, and the
    * per-query argmax maintains the best neighbor in complete mode.
    *
    * The stream side never shuffles for candidate generation and the
    * static side is planned once per micro-batch — the standard
    * stream-static join posture for joining an unbounded stream against
    * an index. The argmax is `max(struct(cosine, -c_vec))`: highest
    * cosine, then LOWEST candidate id — the same (cosine DESC, c_vec)
    * total order as the batch x2 ranking, so the DuckDB oracle replays
    * the result exactly (quantized cosine, integer hyperplanes).
    */
  def annTop1(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{LshBuckets, QuantizedCosine}
    def withBuckets(df: DataFrame, emb: String): DataFrame =
      df.select(col("*"),
        posexplode(LshBuckets.buckets(col(emb), 4, 4)).as(Seq("t", "b")))
    val schema = StreamRun.cachedSchema(spark, dir, "embeddings.parquet")
    val qs = withBuckets(
      spark.readStream
        .schema(schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(dir)
        .where(col("vec_id") < 8)
        .select(col("vec_id").as("q_vec"), col("embedding").as("q_emb")),
      "q_emb")
    val corpus = withBuckets(
      spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("c_vec"), col("embedding").as("c_emb")),
      "c_emb")
    val best = qs.join(corpus, Seq("t", "b"))
      .where(col("c_vec") =!= col("q_vec"))
      .select(col("q_vec"), col("c_vec"),
        QuantizedCosine.quantizedCosine(col("q_emb"), col("c_emb")).as("cosine"))
      .groupBy("q_vec")
      .agg(max(struct(col("cosine"), (-col("c_vec")).as("neg_c"))).as("best"))
      .select(col("q_vec"),
        col("best.cosine").as("best_cosine"),
        (-col("best.neg_c")).as("best_c_vec"))
    StreamRun.toMemorySnapshot(best, "complete", s"stream_ann_${runId.incrementAndGet()}")
      .orderBy("q_vec")
  }

  /** Streaming IVF-PQ serving from the PERSISTED index (the x23
    * artifacts): each streamed query vector assigns to its nearest
    * inverted list via the broadcast centroid fold (stateless,
    * map-side — the stream never shuffles for candidate generation),
    * stream-static-joins that list's persisted codes, ADC-scores them
    * against the broadcast codebook, and keeps the per-query best in
    * complete mode. nProbe = 1 and no refine — the latency tier of the
    * serving stack; batch x23 with probe-2 + refine is the quality
    * tier. Everything is exact-integer, so the DuckDB oracle replays
    * probe, ADC, and the argmin from the same persisted files.
    */
  def annTop1FromIndex(spark: SparkSession, dir: String): DataFrame = {
    import graft.energy.AtomicLayer
    import graft.operators.Similarity
    val root = Similarity.indexRoot(dir)
    Similarity.buildIvfPqIndex(
      spark.read.parquet(s"$dir/embeddings.parquet"), root)
    val centroids = AtomicLayer.read(spark, s"$root/centroids.parquet")
    val sample = AtomicLayer.read(spark, s"$root/codebook.parquet")
    val index = AtomicLayer.read(spark, s"$root/index.parquet")
    val schema = StreamRun.cachedSchema(spark, dir, "embeddings.parquet")
    val qs = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(dir)
      .where(col("vec_id") < 8 &&
        size(col("embedding")) > 0 && size(col("embedding")) % 8 === 0)
      .select(col("vec_id").as("q_vec"), col("embedding").as("q_emb"))
    val cands = Similarity.withNearestList(qs, centroids, "q_emb")
      .join(index, Seq("list_id")) // stream-static: index planned per batch
      .where(col("c_vec") =!= col("q_vec"))
    val best = Similarity.withAdcDist(cands, sample, "q_emb", nSub = 8)
      .groupBy("q_vec")
      .agg(min(struct(col("qdist_approx"), col("c_vec"))).as("best"))
      .select(col("q_vec"),
        col("best.qdist_approx").as("best_qdist"),
        col("best.c_vec").as("best_c_vec"))
    StreamRun.toMemorySnapshot(best, "complete",
        s"stream_ivfpq_${runId.incrementAndGet()}")
      .orderBy("q_vec")
  }

  /** Continuous index MAINTENANCE: the ingest half of the vector-store
    * loop st16/x23 only served. New vectors arrive as a stream; each
    * micro-batch encodes against the PERSISTED base centroids/codebook
    * and upserts into the on-disk code table via
    * [[graft.operators.Similarity.appendToIvfPqIndex]] (id-keyed, so the
    * final index is identical however the stream was micro-batched —
    * and identical to the batch x29 path). Queries are then answered
    * from the merged on-disk index. foreachBatch owns persistence, the
    * engine owns exactly-once batch ids, AtomicLayer owns atomicity —
    * the same division of labor as st13's gold refresh.
    */
  def streamIndexAppend(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val emb = graft.Tables.embeddings(spark, dir)
    val root = Similarity.indexRoot(dir) + "_stream"
    Similarity.buildIvfPqIndex(emb.where(col("vec_id") < 400), root)
    val schema = StreamRun.cachedSchema(spark, dir, "embeddings.parquet")
    val feed = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(dir)
      .where(col("vec_id") >= 400)
    StreamRun.driveForeachBatch(feed, "append",
        s"st21_index_append_${runId.incrementAndGet()}") { (batch, _) =>
      if (!batch.isEmpty) Similarity.appendToIvfPqIndex(batch, root)
    }
    Similarity.ivfPqTopKFromIndex(emb.where(col("vec_id") < 8), emb, root, k = 3)
      .orderBy("q_vec", "rank")
  }

  /** Continuous GRAPH-index maintenance — st21's division of labor
    * applied to the NN-descent tier (VERDICT r10 #4): the base graph
    * builds + freezes once; each arriving micro-batch of vectors
    * NSW-inserts into the persisted edge artifact via
    * [[graft.operators.Similarity.streamInsertIntoGraphIndex]]
    * (beam-locate over the IMMUTABLE frozen base, reverse-link, one
    * monoid top-K re-prune — id-keyed idempotent, AtomicLayer
    * snapshots), so the final graph is identical however the stream was
    * micro-batched and identical to one big batch (GraphIndexSpec pins
    * the law). Queries are then served from the stream-built artifact;
    * the oracle replays the beam search FROM the same persisted edges.
    */
  def streamGraphAppend(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val emb = graft.Tables.embeddings(spark, dir)
    val root = Similarity.graphIndexRoot(dir) + "_stream"
    val old = emb.where(col("vec_id") < 400)
    Similarity.buildNndGraphIndex(old, root)
    Similarity.freezeGraphIndexBase(spark, root)
    val schema = StreamRun.cachedSchema(spark, dir, "embeddings.parquet")
    val feed = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(dir)
      .where(col("vec_id") >= 400 && col("vec_id") < 500)
    StreamRun.driveForeachBatch(feed, "append",
        s"st29_graph_append_${runId.incrementAndGet()}") { (batch, _) =>
      if (!batch.isEmpty) Similarity.streamInsertIntoGraphIndex(old, batch, root)
    }
    Similarity.graphAnnServeFromIndex(
        emb.where(col("vec_id") < 8), emb.where(col("vec_id") < 500), root,
        k = 5, beam = 8, rounds = 3, degree = 5)
      .orderBy("q_vec", "rank")
  }

  /** st29 + the OFFLINE RECONCILIATION pass (VERDICT r11 #2): the same
    * stream-built index on its own root, then ONE
    * [[graft.operators.Similarity.reconcileGraphIndex]] NN-descent
    * round links the cross-batch new×new neighborhoods the
    * batching-invariant inserts deliberately leave for repair, and
    * queries serve from the reconciled artifact (the oracle replays the
    * beam from the same persisted edges — x37's pattern). The reconcile
    * is guarded by a committed marker so the QUERY is run-once
    * deterministic like the build (each unguarded reconcile call is one
    * further refinement round by design — the maintenance cadence, not
    * query-time work).
    */
  def streamGraphReconcile(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    import graft.energy.AtomicLayer
    val emb = graft.Tables.embeddings(spark, dir)
    val root = Similarity.graphIndexRoot(dir) + "_rec"
    val old = emb.where(col("vec_id") < 400)
    Similarity.buildNndGraphIndex(old, root)
    Similarity.freezeGraphIndexBase(spark, root)
    val schema = StreamRun.cachedSchema(spark, dir, "embeddings.parquet")
    val feed = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(dir)
      .where(col("vec_id") >= 400 && col("vec_id") < 500)
    StreamRun.driveForeachBatch(feed, "append",
        s"st30_graph_reconcile_${runId.incrementAndGet()}") { (batch, _) =>
      if (!batch.isEmpty) Similarity.streamInsertIntoGraphIndex(old, batch, root)
    }
    val marker = s"$root/reconciled.parquet"
    if (AtomicLayer.latestCommitted(spark, marker).isEmpty) {
      Similarity.reconcileGraphIndex(emb.where(col("vec_id") < 500), root)
      AtomicLayer.write(spark.range(1).toDF("done"), marker, keepVersions = 1)
      (): Unit
    }
    Similarity.graphAnnServeFromIndex(
        emb.where(col("vec_id") < 8), emb.where(col("vec_id") < 500), root,
        k = 5, beam = 8, rounds = 3, degree = 5)
      .orderBy("q_vec", "rank")
  }
}
