package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus / table audit: the completeness–uniqueness–validity–integrity
  * checks every ingest (the reference validates runs by row counts only —
  * README.md:126-138) needs before data is trusted downstream. Deequ-style
  * metrics, computed relationally.
  *
  * Scale posture: all per-table metrics come from ONE conditional-aggregate
  * pass over the fact table (no per-metric rescans); the referential-
  * integrity check is a single anti-join whose dimension side broadcasts.
  * Output is a tiny long-format (metric, value) table, so the result can
  * be collected, alerted on, or appended to a metrics history cheaply.
  *
  * All metrics are exact BIGINT counts — no floats, so the DuckDB oracle
  * matches bit-for-bit.
  */
object DataQuality {

  /** Audit `orders` against `customer`: row count, null date count,
    * duplicate primary keys, distinct FK cardinality, domain violations
    * (o_orderstatus outside its enum), non-positive totals, and orphaned
    * foreign keys (o_custkey with no customer row).
    */
  def auditOrders(orders: DataFrame, customer: DataFrame): DataFrame = {
    val onePass = orders.agg(
      count(lit(1)).as("n_rows"),
      count(lit(1)).minus(count(col("o_orderdate"))).as("n_null_date"),
      count(lit(1)).minus(countDistinct(col("o_orderkey"))).as("n_dup_pk"),
      countDistinct(col("o_custkey")).as("n_distinct_cust"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L)
        .otherwise(0L)).as("n_bad_status"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("n_nonpos_total"),
    )
    val orphans = orders
      .join(broadcast(customer.select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphan_cust"))
    val wide = onePass.crossJoin(orphans)
    val metrics = Seq("n_rows", "n_null_date", "n_dup_pk", "n_distinct_cust",
      "n_bad_status", "n_nonpos_total", "n_orphan_cust")
    wide
      .select(metrics.map(m => col(m).cast("long").as(m)): _*)
      .unpivot(Array.empty, metrics.map(col).toArray, "metric", "value")
      .orderBy("metric")
  }

  /** k-anonymity audit: group sizes over a quasi-identifier column set,
    * with an at-risk flag for equivalence classes smaller than k. One
    * partial+final aggregate over the table — grouped-count cost, no
    * self-joins — so it runs as a side-output of any ingest at 100 TB.
    */
  def kAnonymity(df: DataFrame, quasiIds: Seq[String], k: Long): DataFrame =
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("group_n"))
      .withColumn("at_risk", col("group_n") < k)
      .orderBy(quasiIds.map(col): _*)
}
