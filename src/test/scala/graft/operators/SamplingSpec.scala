package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf0001)

  test("deterministic: identical selected set across runs and repartitionings") {
    val a = Sampling.deterministicSample(docs, col("doc_id"), "s1", 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(docs.repartition(7), col("doc_id"), "s1", 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "sample must be a pure function of the data, not partitioning")
  }

  test("rate: 4/16 selects roughly a quarter") {
    val n = docs.count().toDouble
    val k = Sampling.deterministicSample(docs, col("doc_id"), "s1", 4).count().toDouble
    assert(k / n > 0.10 && k / n < 0.40, s"got ${k / n}")
  }

  test("different seeds draw different samples") {
    val a = Sampling.deterministicSample(docs, col("doc_id"), "s1", 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(docs, col("doc_id"), "s2", 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a != b)
  }

  test("nested rates: n/16 sample contains the (n-1)/16 sample") {
    val s2 = Sampling.deterministicSample(docs, col("doc_id"), "s1", 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s4 = Sampling.deterministicSample(docs, col("doc_id"), "s1", 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s2.subsetOf(s4), "hex-prefix classes nest by construction")
  }

  test("filter stays adjacent to the scan (no shuffle introduced)") {
    val plan = Sampling.deterministicSample(docs, col("doc_id"), "s1", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(400))
  }
}
