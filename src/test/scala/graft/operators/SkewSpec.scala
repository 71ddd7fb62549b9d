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

  test("salted join equals plain join (exact row multiset)") {
    val ev = Tables.events(spark, sf0001)
    val dim = spark.range(100).select(
      col("id").as("user_id"), (col("id") % 5).as("cohort"))
    val plain = ev.join(dim, Seq("user_id"))
      .groupBy("cohort").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(ev, dim, Seq("user_id"), col("event_id"))
      .groupBy("cohort").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("AQE splits a skewed sort-merge join without any code change") {
    // 90% of fact rows share one key: the escalation path BEFORE explicit
    // salting is AQE's skew split — prove it engages on this shape.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
      val facts = spark.range(20000).select(
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"),
        col("id").as("payload"))
      val dim = spark.range(100).select(col("id").as("k"), (col("id") * 2).as("attr"))
      val joined = facts.join(dim, "k")
      // collect(), not count(): count() builds its own query and would
      // leave THIS df's adaptive plan unexecuted/unfinalized
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE skew handling did not engage:\n${plan.take(600)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("salted join: a row meets each dim match in exactly one salt bucket") {
    val ev = Tables.events(spark, sf0001).limit(50)
    val dim = spark.range(100).select(
      col("id").as("user_id"), (col("id") % 5).as("cohort"))
    val out = Skew.saltedJoin(ev, dim, Seq("user_id"), col("event_id"))
    val dups = out.groupBy("event_id").agg(count(lit(1)).as("n"))
      .where(col("n") > 1).count()
    assert(dups == 0, "no fan-out: dim is unique per key, so one row per event")
  }
}
