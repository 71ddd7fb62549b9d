package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Runtime (bloom) filter injection — the 100 TB join-pruning tier: when a
  * shuffle join has a selective creation side, Catalyst plants a bloom
  * filter from it onto the big probe side's scan, cutting shuffled bytes
  * before the join. Local thresholds are tuned down so the tiny fixture
  * triggers the same rewrite a warehouse-scale scan would.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dimension injects a bloom filter onto the fact scan") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
    )
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val big = Tables.lineitem(spark, sf0001)
      val dim = Tables.orders(spark, sf0001)
        .where(col("o_orderpriority") === "1-URGENT" && col("o_custkey") < 50)
      val j = big.join(dim, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_quantity"), col("o_custkey"))
      j.count()
      val plan = (j.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).toString
      assert(plan.toLowerCase.contains("bloomfilter") ||
        plan.contains("might_contain"),
        s"no runtime bloom filter in plan:\n${plan.take(1200)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
