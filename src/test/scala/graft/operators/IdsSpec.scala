package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class IdsSpec extends SparkSpec {

  test("ids are dense, start at startAt, and equal global ROW_NUMBER order") {
    val docs = Tables.documents(spark, sf0001).select("doc_id")
    val got = Ids.contiguousIds(docs, Seq(col("doc_id")), idCol = "rid", startAt = 100L)
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getLong(1))
    val n = got.length
    assert(got.map(_._2).toSeq == (100L until 100L + n).toSeq, "dense + ordered")
    val expected = docs
      .withColumn("rid", row_number().over(Window.orderBy("doc_id")) + 99L)
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.toSeq == expected.toSeq)
  }

  test("no single-partition global sort in the plan") {
    val docs = Tables.documents(spark, sf0001).select("doc_id")
    val plan = Ids.contiguousIds(docs, Seq(col("doc_id")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global window bottleneck detected:\n${plan.take(500)}")
  }

  test("skewed partition sizes still produce correct dense ids") {
    import spark.implicits._
    // values concentrated so range partitions are uneven
    val df = (0L until 500L).map(i => if (i < 450) i % 7 * 1000 + i else i * 100)
      .toDF("v").distinct()
    val got = Ids.contiguousIds(df, Seq(col("v")), idCol = "rid")
      .orderBy("v").collect().map(_.getLong(1))
    assert(got.toSeq == (0L until got.length).toSeq)
  }
}
