package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy aggregations: two-phase salted aggregation.
  *
  * A single hot key (think: the empty document, a null-ish user id, one
  * dominant production type) funnels its entire group through one reducer.
  * Salting splits each key into `numSalts` subkeys for a partial
  * aggregate, then combines partials in a second (tiny) aggregate. Exact
  * for decomposable aggregates (sum/count/min/max).
  *
  * AQE's skew-join handling covers joins; this covers group-bys, which
  * AQE does not rebalance.
  */
object Skew {

  /** Exact salted SUM + COUNT by `key`. The salt derives from a hash of
    * `saltBy` (any column with per-row variety, e.g. the row's natural id)
    * so it is deterministic — no rand(), re-runs produce identical plans
    * and results.
    */
  def saltedSumCount(
      df: DataFrame,
      key: Column,
      value: Column,
      saltBy: Column,
      numSalts: Int = 16,
  ): DataFrame = {
    val salted = df.select(
      key.as("k"),
      value.as("v"),
      pmod(xxhash64(saltBy), lit(numSalts)).as("salt"),
    )
    salted
      .groupBy(col("k"), col("salt"))
      .agg(sum(col("v")).as("partial_sum"), count(lit(1)).as("partial_n"))
      .groupBy(col("k"))
      .agg(sum(col("partial_sum")).as("total"), sum(col("partial_n")).as("n"))
  }

  /** Salted equi-join for a skewed fact side: each fact row gets a
    * deterministic salt from `saltBy`, the (small) dimension is replicated
    * `numSalts` times, and the join keys on (key, salt) — a hot fact key
    * now spreads over `numSalts` reducers instead of one.
    *
    * Result set is EXACTLY the unsalted `facts.join(dim, keys)`: every
    * fact row still meets every matching dim row (in exactly one salt
    * bucket). Use when the dim is too big to broadcast outright but
    * `numSalts` × dim still shuffles cheaply; when the dim broadcasts,
    * prefer `broadcast(dim)` (no salt needed — broadcast joins don't
    * skew). AQE's skew-join split handles moderate skew; explicit salting
    * is for the pathological single-key case AQE can't subdivide further.
    */
  def saltedJoin(
      facts: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      saltBy: Column,
      numSalts: Int = 16,
  ): DataFrame = {
    require(!facts.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "saltedJoin uses a __salt working column; rename the input's __salt first")
    val saltVals = array((0 until numSalts).map(lit): _*)
    val saltedFacts = facts
      .withColumn("__salt", pmod(xxhash64(saltBy), lit(numSalts)).cast("int"))
    val saltedDim = dim
      .withColumn("__salt", explode(saltVals))
    saltedFacts
      .join(saltedDim, keys :+ "__salt")
      .drop("__salt")
  }
}
