package graft.operators

import graft.functions.VectorMath
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k. The query side is tiny and
  *    broadcast; the candidate side streams — no shuffle of the corpus, so
  *    at 100 TB it is one scan + a per-query top-k (still O(queries x
  *    corpus) compute: the baseline).
  *  - [[lshTopK]]: random-hyperplane LSH. Both sides hash to sign-pattern
  *    buckets; only same-bucket pairs are scored. The corpus shuffles once
  *    by bucket — the scale path (recall < 1 by construction).
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector. */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
  ): DataFrame = {
    val q = broadcast(
      queries.select(col("vec_id").as("q_vec"), col("embedding").as("q_emb")))
    val c = corpus.select(col("vec_id").as("c_vec"), col("embedding").as("c_emb"))
    val w = Window.partitionBy(col("q_vec")).orderBy(col("cosine").desc, col("c_vec"))
    c.join(q, col("c_vec") =!= col("q_vec"))
      .select(
        col("q_vec"), col("c_vec"),
        VectorMath.cosineExact(col("q_emb"), col("c_emb")).as("cosine"),
      )
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_vec", "rank", "c_vec", "cosine")
  }

  /** Deterministic INTEGER hyperplane weight for (plane, dim): an LCG
    * step mapped to [-1000, 1000]. No RNG state and no floating point,
    * so every engine (and every re-run) derives the identical planes —
    * and because the bucket dot products below are sums of exact
    * integers (|q| < 2^21, |w| <= 2^10, 64 dims → < 2^38), bucket
    * assignment is evaluation-order-independent and recomputable in
    * plain SQL (the x2 oracle does). Public contract: the native
    * [[graft.functions.LshBuckets]] expression reproduces this table
    * exactly.
    */
  def planeWeightInt(p: Int, d: Int): Long =
    ((1103515245L * (p * 64 + d) + 12345L) % 2001L + 2001L) % 2001L - 1000L

  /** Sign-pattern bucket id from `nPlanes` hyperplanes: bit i set iff
    * sum_d floor(emb[d] * 2^20) * planeWeightInt(offset + i, d) > 0.
    * `planeOffset` selects a disjoint plane family — table t of an
    * OR-construction uses offset t * nPlanes.
    */
  def lshBucket(emb: Column, dim: Int, nPlanes: Int, planeOffset: Int = 0): Column =
    (0 until nPlanes)
      .map { i =>
        val dot = (0 until dim)
          .map(d => floor(emb.getItem(d).cast(DoubleType) * 1048576.0).cast(LongType) *
            lit(planeWeightInt(planeOffset + i, d)))
          .reduce(_ + _)
        when(dot > 0, lit(1L << i)).otherwise(0L)
      }
      .reduce(_ + _)

  /** IVF-style top-k: the corpus is partitioned into `nCentroids`
    * inverted lists by nearest centroid; each query probes its `nProbe`
    * nearest lists and ranks only those candidates.
    *
    * Centroids here are a deterministic sample of the corpus (first
    * `nCentroids` by vec_id) — a k-means step would slot in unchanged
    * (IVF cares only that assignment uses the same centroid set on both
    * sides). At scale: centroids broadcast everywhere, the corpus
    * shuffles ONCE by centroid id (a write-time layout in a real store),
    * and each query reads nProbe/nCentroids of the data.
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 2,
  ): DataFrame = {
    // Quantized (integer-exact) cosine throughout: every sum is of
    // exact integers < 2^53, so assignment argmaxes and ranks are
    // bit-identical on ANY engine in ANY evaluation order — which is
    // what lets the x5 oracle recompute the full IVF pipeline in DuckDB
    // (float cosine sums are order-dependent near ties; quantized ones
    // are not).
    import graft.functions.QuantizedCosine.{quantizedCosine => cosine}
    val centroids = corpus.orderBy(col("vec_id")).limit(nCentroids)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb"))

    // CORPUS assignment (n = 1) is the scale-critical branch: fold an
    // argmax over a one-row broadcast array of all centroids — a
    // BroadcastNestedLoopJoin against a single row plus a per-row
    // `aggregate` lambda, so the corpus is assigned with ZERO exchange
    // and zero per-key sort (the earlier crossJoin + row_number window
    // shuffled 16x the corpus just to compute this argmax). Strictly-
    // greater over the id-sorted array keeps the LOWEST centroid_id on
    // ties — the same tie-break as a (sim DESC, centroid_id ASC) window.
    val centArr = broadcast(centroids.agg(
      array_sort(collect_list(struct(col("centroid_id"), col("c_emb")))).as("__cents")))
    def nearestList(embCol: Column): Column =
      aggregate(
        col("__cents"),
        struct(lit(-2.0).as("sim"), lit(-1L).as("centroid_id")),
        (acc, c) => {
          val s = cosine(embCol, c.getField("c_emb"))
          when(s > acc.getField("sim"),
            struct(s.as("sim"), c.getField("centroid_id").as("centroid_id")))
            .otherwise(acc)
        },
      ).getField("centroid_id")

    val c = corpus
      .select(col("vec_id").as("c_vec"), col("embedding").as("c_emb2"))
      .crossJoin(centArr)
      .withColumn("list_id", nearestList(col("c_emb2")))
      .drop("__cents")

    // QUERY assignment keeps the rank formulation (nProbe > 1 list ids
    // per query): the query side is tiny and the row_number idiom itself
    // plans as the bounded-heap TopKPerKey operator via the rewrite.
    val q = {
      val w = Window.partitionBy(col("q_vec")).orderBy(col("__sim").desc, col("centroid_id"))
      queries
        .select(col("vec_id").as("q_vec"), col("embedding").as("q_emb"))
        .crossJoin(broadcast(centroids))
        .withColumn("__sim", cosine(col("q_emb"), col("c_emb")))
        .withColumn("__rk", row_number().over(w))
        .where(col("__rk") <= nProbe)
        .withColumn("list_id", col("centroid_id"))
        .drop("centroid_id", "c_emb", "__sim", "__rk")
    }

    val w = Window.partitionBy(col("q_vec")).orderBy(col("cosine").desc, col("c_vec"))
    c.join(broadcast(q), Seq("list_id"))
      .where(col("c_vec") =!= col("q_vec"))
      .select(
        col("q_vec"), col("c_vec"), col("list_id"),
        cosine(col("q_emb"), col("c_emb2")).as("cosine"),
      )
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_vec", "rank", "c_vec", "cosine", "list_id")
  }

  /** LSH-bucketed top-k with an OR-construction: `nTables` independent
    * hash tables of `nPlanes` hyperplanes each; a corpus vector is a
    * candidate for a query when they share a bucket in ANY table.
    * Recall for near pairs is 1 - (1 - p^nPlanes)^nTables — a single
    * table (the previous shape) measured recall@3 = 0.25 on the sf0.01
    * fixture; four tables lift it well past 0.5 at 4x the (cheap)
    * hashing and candidate cost, the classic LSH quality dial.
    *
    * Scale shape: the query side is tiny and BROADCAST, so the corpus
    * explodes its nTables (table, bucket) keys map-side and joins
    * without a shuffle. The only exchange is the candidate-pair dedup
    * (groupBy on (q_vec, c_vec) — max-cosine + table count), which
    * carries scored id pairs, never embeddings; the final rank idiom
    * plans as the bounded-heap TopKPerKey operator.
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      dim: Int = 64,
      nPlanes: Int = 4,
      nTables: Int = 4,
  ): DataFrame = {
    // All table buckets in one fused native kernel (LshBuckets): the
    // Column-composed equivalent is nTables x nPlanes x dim expression
    // nodes, which overflows codegen's method budget (measured 7x
    // slower). posexplode yields the (table, bucket) join key.
    def withTableBuckets(df: DataFrame, embCol: String): DataFrame =
      df.select(col("*"),
        posexplode(graft.functions.LshBuckets.buckets(col(embCol), nPlanes, nTables))
          .as(Seq("t", "b")))
    val q = broadcast(withTableBuckets(
      queries.select(col("vec_id").as("q_vec"), col("embedding").as("q_emb")), "q_emb"))
    val c = withTableBuckets(
      corpus.select(col("vec_id").as("c_vec"), col("embedding").as("c_emb")), "c_emb")
    val w = Window.partitionBy(col("q_vec")).orderBy(col("cosine").desc, col("c_vec"))
    c.join(q, Seq("t", "b"))
      .where(col("c_vec") =!= col("q_vec"))
      .select(
        col("q_vec"), col("c_vec"),
        // Native codegen'd QUANTIZED cosine: one fused loop per pair,
        // and — like the bucket dots above — exact-integer accumulation,
        // so the whole x2 pipeline (buckets, candidates, ranks) is
        // engine-recomputable.
        graft.functions.QuantizedCosine.quantizedCosine(col("q_emb"), col("c_emb")).as("cosine"),
      )
      // a pair colliding in several tables scores identically each time:
      // dedup on ids, keeping the collision count as a diagnostic
      .groupBy("q_vec", "c_vec")
      .agg(max(col("cosine")).as("cosine"), count(lit(1)).as("n_tables"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_vec", "rank", "c_vec", "cosine", "n_tables")
  }
}
