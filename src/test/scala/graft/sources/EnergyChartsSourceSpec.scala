package graft.sources

import graft.SparkSpec
import graft.energy.Silver
import org.apache.spark.sql.functions._

class EnergyChartsSourceSpec extends SparkSpec {

  private def read(dataset: String) =
    spark.read.format("energy-charts")
      .option("dataset", dataset)
      .option("start", "2025-01-01")
      .option("end", "2025-01-07")
      .load()

  test("one bronze row per day; schema matches the bronze contract") {
    val df = read("power")
    assert(df.columns.toSeq == Seq("country", "date", "payload_json"))
    assert(df.count() == 7)
    assert(df.rdd.getNumPartitions == 7) // one partition per day
    val price = read("price")
    assert(price.columns.head == "market")
    assert(price.count() == 7)
  }

  test("date equality filter prunes partitions at planning time") {
    val df = read("power").where(col("date") === "2025-01-03")
    assert(df.count() == 1)
    assert(df.rdd.getNumPartitions == 1) // pushdown narrowed the plan, not a post-filter
  }

  test("date range filter narrows the partition span") {
    val df = read("power")
      .where(col("date") >= "2025-01-02" && col("date") < "2025-01-05")
    assert(df.count() == 3)
    assert(df.rdd.getNumPartitions == 3)
  }

  test("column pruning: projecting date only still serves rows") {
    val dates = read("power").select("date").collect().map(_.getString(0)).sorted
    assert(dates.length == 7 && dates.head == "2025-01-01" && dates.last == "2025-01-07")
  }

  test("connector bronze feeds the silver pipeline end to end") {
    val silver = Silver.powerToSilver(read("power").where(col("date") <= "2025-01-02"))
    // 2 days x 96 points x 4 production types
    assert(silver.count() == 2 * 96 * 4)
  }

  test("contradictory range yields an empty plan, not an error") {
    val df = read("power").where(col("date") > "2025-02-01")
    assert(df.count() == 0)
  }
}
