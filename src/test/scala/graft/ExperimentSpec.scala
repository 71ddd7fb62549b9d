package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** ExperimentQueries semantics: the DuckDB oracle proves cross-engine
  * agreement on the shared formula; these tests prove the formula is the
  * STATISTIC — KS and Gini recomputed from first principles in plain
  * Scala, plus the no-global-window scale guard for every query that
  * ranks through the distributed prefix sum.
  */
class ExperimentSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf0001)

  test("ks1 matches a first-principles two-sample KS computation") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("n_chars", "source = 'src0' AS a").collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    val a = docs.filter(_._2).map(_._1).sorted
    val b = docs.filterNot(_._2).map(_._1).sorted
    val ks = (a ++ b).distinct.map { v =>
      math.abs(a.count(_ <= v).toDouble / a.length -
        b.count(_ <= v).toDouble / b.length)
    }.max
    val got = q("ks1_source_drift").collect().head
    assert(got.getLong(0) === a.length.toLong)
    assert(got.getLong(1) === b.length.toLong)
    assert(math.abs(got.getDouble(3) - ks) < 1e-12,
      s"KS ${got.getDouble(3)} != brute-force $ks")
  }

  test("gini1 matches the first-principles sorted-rank Gini") {
    val xs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("n_chars").collect().map(_.getLong(0)).sorted
    val n = xs.length
    val t = xs.sum
    val s = xs.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum
    val expected = 2.0 * s / (n.toDouble * t) - (n + 1.0) / n
    val got = q("gini1_length_concentration").collect().head
    assert(got.getLong(0) === n.toLong && got.getLong(1) === t)
    assert(math.abs(got.getDouble(2) - expected) < 1e-12,
      s"gini ${got.getDouble(2)} != brute-force $expected")
  }

  test("ab1: z-statistic agrees with direct computation from the four counts") {
    val r = q("ab1_conversion_ztest").collect().head
    val (na, xa, nb, xb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val p = (xa + xb).toDouble / (na + nb)
    val z = (xa.toDouble / na - xb.toDouble / nb) /
      math.sqrt(p * (1 - p) * (1.0 / na + 1.0 / nb))
    assert(math.abs(r.getDouble(4) - z) < 1e-12)
    assert(na + nb === spark.read.parquet(s"$sf0001/events.parquet")
      .select("user_id").distinct().count())
  }

  test("chi1: cells cover the full contingency table and contributions are non-negative") {
    val rows = q("chi1_contingency").collect()
    val totalEvents = spark.read.parquet(s"$sf0001/events.parquet").count()
    assert(rows.map(_.getLong(2)).sum === totalEvents)
    rows.foreach { r =>
      assert(r.getDouble(4) >= 0.0)
      assert(r.getInt(1) >= 1 && r.getInt(1) <= 7)
    }
  }

  test("rfm1: segments partition all users exactly once") {
    val out = q("rfm1_segments").collect()
    val users = spark.read.parquet(s"$sf0001/events.parquet")
      .select("user_id").distinct().count()
    assert(out.map(_.getLong(1)).sum === users)
    assert(out.map(_.getString(0)).distinct.length === out.length)
  }

  test("ks1/gini1/rfm1: no partition-less window (ranks run through the prefix sum)") {
    for (name <- Seq("ks1_source_drift", "gini1_length_concentration", "rfm1_segments")) {
      val df = SparkEntry.queries(name)(spark, sf0001)
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p: SparkPlan => p
      }
      val bad = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty, s"$name: global-sort window found")
    }
  }
}
