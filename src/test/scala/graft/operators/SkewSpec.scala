package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted aggregation equals direct aggregation (exact decomposable aggs)") {
    val li = Tables.lineitem(spark, sf0001)
    val direct = li.groupBy(col("l_returnflag").as("k"))
      .agg(sum(col("l_quantity")).as("total"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Skew.saltedSumCount(
      li, col("l_returnflag"), col("l_quantity"), col("l_orderkey"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted.keySet == direct.keySet)
    // sums of doubles: salted partials may round differently; quantities
    // are integral doubles here, so equality is exact
    assert(salted == direct)
  }

  test("two-phase plan: partial aggregate keys include the salt") {
    val li = Tables.lineitem(spark, sf0001)
    val plan = Skew.saltedSumCount(
      li, col("l_returnflag"), col("l_quantity"), col("l_orderkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("salt"))
  }
}
