package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bucketing: pre-shuffle both sides of a recurring join once at write
  * time, then join shuffle-free forever after — the 100 TB co-location
  * strategy SCALE.md describes, demonstrated end-to-end on the local
  * catalog.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val db = "graft_bucketing_spec"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      Tables.orders(spark, sf0001)
        .write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable(s"$db.orders_b")
      Tables.customer(spark, sf0001)
        .write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable(s"$db.customer_b")

      // force a non-broadcast strategy so the join actually depends on
      // the bucketed distribution
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val o = spark.table(s"$db.orders_b")
        val c = spark.table(s"$db.customer_b")
        val joined = o.join(c, o("o_custkey") === c("c_custkey"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan.take(500))
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join should not re-shuffle:\n${plan.take(800)}")
        assert(joined.count() == Tables.orders(spark, sf0001).count())
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      }
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
