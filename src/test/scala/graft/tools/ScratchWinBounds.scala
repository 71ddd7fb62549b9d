package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway: measure the row count feeding every allowlisted global
  * (partition-less) window at a given SF, to set the RegistryPlanSweepSpec
  * bound per entry (VERDICT r15 #8).
  */
object ScratchWinBounds {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("a18_trimmed_mean", "a12_percentile_disc", "cd1_cum_users",
      "dm1_mixture_weights", "dm2_temperature_mix", "dm3_budget_apportion",
      "hr1_hierarchical_share", "iv1_open_orders_census", "km1_life_table",
      "sky1_skyline", "tok2_vocab_coverage", "ams1_f2_sketch",
      "rrf1_rank_fusion", "qsk1_sample_quantiles", "st28_stream_quantile_sketch",
      "zipf1_rank_frequency", "usp1_unigram_lm")
    for (name <- names) {
      try {
        val df = graft.SparkEntry.queries(name)(spark, dir)
        df.queryExecution.toRdd.foreach(_ => ())
        def allNodes(p0: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = p0 match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => p0 +: allNodes(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => p0 +: allNodes(q.plan)
          case _ => p0 +: p0.children.flatMap(allNodes)
        }
        val wins = allNodes(df.queryExecution.executedPlan).collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
        }
        def rowsInto(p0: org.apache.spark.sql.execution.SparkPlan): String = {
          val it = allNodes(p0).collectFirst {
            case n if n.metrics.contains("numOutputRows") =>
              s"${n.nodeName}:${n.metrics("numOutputRows").value}"
            case n if n.metrics.contains("shuffleRecordsWritten") =>
              s"${n.nodeName}:${n.metrics("shuffleRecordsWritten").value}"
          }
          it.getOrElse("none")
        }
        val counts = wins.map(w => rowsInto(w.child))
        println(s"WINB $name windows=${wins.size} counts=${counts.mkString(",")}")
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      } catch {
        case e: Throwable => println(s"WINB $name PLANFAIL ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
