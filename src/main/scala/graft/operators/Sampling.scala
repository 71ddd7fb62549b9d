package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` draws from a per-partition RNG: the selected set changes
  * with partitioning, retries, and cluster size — useless when a sample
  * must be reproducible across reruns or (as here) re-derivable by a
  * second engine. Hash-gating on a stable key instead gives a sample
  * that is a pure function of the data: `keep(row) = md5(seed || key)
  * starts with one of k/16 hex digits`, an exact k/16 rate in
  * expectation, identical on any engine with md5.
  *
  * At 100 TB this is a narrow codegen'd filter pushed to just above the
  * scan — no shuffle, no coordination, each split samples independently.
  */
object Sampling {

  /** Hex-digit prefix classes for a rate of n/16. */
  private def hexClass(n: Int): Seq[String] =
    "0123456789abcdef".take(n).map(_.toString)

  /** The shared seeded hash gate: first hex digit of md5(seed:key).
    * Both samplers MUST use this one expression — the flat/stratified
    * equivalence and rate nesting hold only while the hash is identical.
    */
  private def hexDigit(key: Column, seed: String): Column =
    substring(md5(concat(lit(seed + ":"), key.cast("string"))), 1, 1)

  /** Deterministic Bernoulli sample: keeps rows whose seeded key-hash
    * falls in the first `sixteenths`/16 of the hash space.
    */
  def deterministicSample(
      df: DataFrame,
      key: Column,
      seed: String,
      sixteenths: Int,
  ): DataFrame = {
    require(sixteenths >= 1 && sixteenths <= 16, "rate is n/16, 1 <= n <= 16")
    df.where(hexDigit(key, seed).isin(hexClass(sixteenths): _*))
  }

  /** Stratified deterministic sample: a different n/16 rate per stratum
    * value (the data-mixing primitive — e.g. downsample web text, keep
    * all code). Same hash gate, same scale shape (narrow filter above
    * the scan), same reproducibility; per-stratum rates nest exactly
    * like the flat sample's.
    */
  def stratifiedSample(
      df: DataFrame,
      key: Column,
      strata: Column,
      seed: String,
      rates: Map[String, Int],
      defaultSixteenths: Int,
  ): DataFrame = {
    require((rates.values ++ Seq(defaultSixteenths)).forall(n => n >= 0 && n <= 16),
      "rates are n/16, 0 <= n <= 16")
    val hex = hexDigit(key, seed)
    def keep(n: Int): Column =
      if (n == 0) lit(false) else hex.isin(hexClass(n): _*)
    val gate = rates.foldLeft(when(lit(false), lit(true))) {
      case (acc, (value, n)) => acc.when(strata === value, keep(n))
    }.otherwise(keep(defaultSixteenths))
    df.where(gate)
  }

  /** Exact order statistics over a bottom-k hash sample — the shared
    * tail of qsk1 (both batch paths) and st28 (the streamed min-k
    * state), factored to ONE definition so the streaming/batch
    * equivalence the specs pin cannot drift. `sample` carries
    * (cents, h) with ≤ k rows (callers limit first); estimates are the
    * rank-ceil(kk·q) order statistics with (cents, h) tie-breaks. The
    * partition-less rank window is bounded by the sample size, never
    * data — allowlisted per query in RegistryPlanSweepSpec.
    */
  def bottomKQuantiles(sample: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = sample.withColumn("rk",
      row_number().over(Window.orderBy(col("cents"), col("h"))))
    def os(q: Double, name: String) =
      max(when(col("rk") ===
        ceil(col("kk") * lit(q)).cast("long"), col("cents"))).as(name)
    ranked.crossJoin(broadcast(ranked.agg(count(lit(1)).as("kk"))))
      .agg(max(col("kk")).as("k_sample"), os(0.25, "p25_est"),
        os(0.5, "p50_est"), os(0.75, "p75_est"), os(0.9, "p90_est"))
  }
}
