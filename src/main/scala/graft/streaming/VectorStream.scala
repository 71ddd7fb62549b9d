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
}
