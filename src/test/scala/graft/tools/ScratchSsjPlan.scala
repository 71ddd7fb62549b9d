package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only plan census for the set-similarity family: how many times
  * does the physical plan COMPUTE the per-doc array aggregate
  * (collect_list) and the shingle relation, vs reusing an exchange —
  * the deterministic answer to "did ReuseExchange fire", independent of
  * box noise. AQE hides finalized subplans, so this disables it for the
  * census (the reuse decision is the same either way).
  */
object ScratchSsjPlan {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- Seq("d11", "ssj1")) {
      val df =
        if (q == "d11")
          graft.operators.SetSimilarityJoin.containmentJoin(
            graft.Tables.documentsParallel(spark, dir), 3, 0.8)
        else
          graft.operators.SetSimilarityJoin.prefixJaccardJoin(
            graft.Tables.documentsParallel(spark, dir), 3, 0.7)
      val plan = df.queryExecution.executedPlan.toString
      def n(pat: String) = pat.r.findAllIn(plan).length
      println(s"$q: collect_list aggs = ${n("collect_list")}, " +
        s"ReusedExchange = ${n("ReusedExchange")}, " +
        s"Exchange = ${n("(?m)^[^R]*Exchange")}, " +
        s"SortMergeJoin = ${n("SortMergeJoin")}, " +
        s"ShuffledHashJoin = ${n("ShuffledHashJoin")}, " +
        s"Scan(LogicalRDD/ExistingRDD) = ${n("Scan ExistingRDD")}")
    }
    spark.stop()
  }
}
