package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV and JSON file sources: schema-stable round-trips through both
  * text formats preserve the relation exactly (long/string/date columns —
  * the types a text interchange format carries losslessly; doubles ride
  * through JSON bit-exactly via the full-precision writer but are
  * deliberately excluded from the CSV leg, where formatting is lossy).
  */
class FormatRoundTripSpec extends SparkSpec {

  private def tmp(p: String) = graft.tools.Scratch.dir(p).toString

  test("JSON round-trip preserves orders exactly (schema-applied read)") {
    val orig = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), to_date(col("o_orderdate")).as("d"))
    val dir = tmp("json-rt")
    orig.write.mode("overwrite").json(dir)
    val back = spark.read.schema(orig.schema).json(dir)
    assert(back.count() === orig.count())
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty,
      "JSON round-trip changed rows")
  }

  test("CSV round-trip preserves key/string/date columns exactly") {
    val orig = Tables.customer(spark, sf0001)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    val dir = tmp("csv-rt")
    orig.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read
      .schema(StructType(Seq(
        StructField("c_custkey", LongType),
        StructField("c_name", StringType),
        StructField("c_mktsegment", StringType))))
      .option("header", "true").csv(dir)
    assert(back.count() === orig.count())
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty,
      "CSV round-trip changed rows")
  }

  test("ORC round-trip preserves all column types exactly, including doubles") {
    val orig = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), to_date(col("o_orderdate")).as("d"))
    val dir = tmp("orc-rt")
    orig.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema === orig.schema, "ORC round-trip changed the schema")
    assert(back.count() === orig.count())
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty,
      "ORC round-trip changed rows")
  }

  test("ORC scans push filters down like parquet") {
    val dir = tmp("orc-push")
    Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.mode("overwrite").orc(dir)
    val q = spark.read.orc(dir).where(col("o_totalprice") > 100000.0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(o_totalprice"),
      s"expected pushed filter in ORC scan:\n$plan")
  }

  test("CSV schema-inference agrees with the declared schema on types") {
    val dir = tmp("csv-inf")
    Tables.customer(spark, sf0001)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .write.mode("overwrite").option("header", "true").csv(dir)
    val inferred = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(dir)
    assert(inferred.schema("c_custkey").dataType.isInstanceOf[NumericType])
    assert(inferred.schema("c_acctbal").dataType === DoubleType)
    assert(inferred.schema("c_name").dataType === StringType)
  }
}
