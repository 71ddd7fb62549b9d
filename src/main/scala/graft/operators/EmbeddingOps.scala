package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-column operations for a training-data pipeline: norms,
  * centroid (average) pooling, int8 quantization statistics.
  *
  * Cross-engine determinism follows the repo-wide quantization contract
  * (SCALE.md): floats are scaled by 2^20 (an exponent shift — no
  * rounding) and floored to longs, all accumulation is exact integer
  * arithmetic, and any final division is a single double op with
  * bit-identical operands on every engine.
  *
  * Scale shapes:
  *  - norms / quant stats are higher-order-function folds — narrow,
  *    codegen'd, zero shuffle, linear in splits;
  *  - centroid pooling explodes to (label, dim) and aggregates — one
  *    shuffle keyed on (label, dim), map-side partials do the heavy
  *    reduction, and the result cardinality (labels × dims) is tiny no
  *    matter how many vectors flow in.
  */
object EmbeddingOps {

  /** floor(v * 2^20) as a long-typed column expression. */
  private def q20(v: org.apache.spark.sql.Column) =
    floor(v.cast(DoubleType) * 1048576.0).cast(LongType)

  /** L2 norms from exact integer squares: (vec_id, n_dims, qnorm2, norm).
    * qnorm2 < dims * 2^42 — safe in a long up to ~2^20 dims.
    */
  def norms(embeddings: DataFrame): DataFrame =
    embeddings.select(
      col("vec_id"),
      size(col("embedding")).as("n_dims"),
      aggregate(
        col("embedding"),
        lit(0L),
        (acc, v) => acc + q20(v) * q20(v),
      ).as("qnorm2"),
    ).withColumn("norm", sqrt(col("qnorm2").cast(DoubleType)) / 1048576.0)

  /** Average-pool embeddings per label (class centroids): one output row
    * per (label, dim). The centroid component is sum(q)/(n * 2^20) — an
    * exact-integer numerator and denominator, one double division.
    */
  def centroids(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg(count(lit(1)).as("n_vecs"), sum(q20(col("v"))).as("sum_q"))
      .select(
        col("label"),
        col("dim"),
        col("n_vecs"),
        (col("sum_q").cast(DoubleType) / (col("n_vecs").cast(DoubleType) * 1048576.0))
          .as("centroid"),
      )

  /** Int8 quantization statistics per vector: clip count (|v| > 1 would
    * saturate), the quantized sum, and the quantized min/max — the
    * calibration numbers an int8 export pipeline collects in one pass.
    */
  def int8QuantStats(embeddings: DataFrame): DataFrame = {
    def q8(v: org.apache.spark.sql.Column) =
      greatest(lit(-127L), least(lit(127L), floor(v.cast(DoubleType) * 127.0).cast(LongType)))
    embeddings.select(
      col("vec_id"),
      size(filter(col("embedding"), v => abs(v.cast(DoubleType)) > 1.0)).as("n_clipped"),
      aggregate(col("embedding"), lit(0L), (acc, v) => acc + q8(v)).as("sum_q8"),
      array_min(transform(col("embedding"), q8(_))).as("min_q8"),
      array_max(transform(col("embedding"), q8(_))).as("max_q8"),
    )
  }
}
