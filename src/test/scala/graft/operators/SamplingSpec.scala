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

  test("stratified: per-stratum rates apply; zero rate drops the stratum") {
    val s = Sampling.stratifiedSample(
      docs, col("doc_id"), col("lang"), "mix", Map("en" -> 0, "de" -> 16), 4)
    val byLang = s.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.contains("en"), "rate 0/16 must drop every en doc")
    val deTotal = docs.where(col("lang") === "de").count()
    assert(byLang.getOrElse("de", 0L) == deTotal, "rate 16/16 keeps all")
  }

  test("stratified gate reuses the flat sample's hash: stratum rate n == flat n") {
    val flat = Sampling.deterministicSample(docs, col("doc_id"), "mix", 4)
      .where(col("lang") === "fr").select("doc_id").collect().map(_.getLong(0)).toSet
    val strat = Sampling.stratifiedSample(
      docs, col("doc_id"), col("lang"), "mix", Map.empty, 4)
      .where(col("lang") === "fr").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flat == strat)
  }

  test("filter stays adjacent to the scan (no shuffle introduced)") {
    val plan = Sampling.deterministicSample(docs, col("doc_id"), "s1", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(400))
  }
}
