package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val log = Seq(
    (1L, 100L, 10L, "a"), (1L, 200L, 11L, "b"), (1L, 300L, 12L, "c"),
    (2L, 150L, 20L, "x"),
  ).toDF("k", "ts", "eid", "payload")

  test("intervals abut: each effective_to equals the next effective_from") {
    val h = Scd2.buildHistory(log, col("k"), col("ts"), col("eid"))
      .orderBy("k", "version").collect()
    val k1 = h.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getAs[Int]("version")).toSeq == Seq(1, 2, 3))
    assert(k1(0).getAs[Long]("effective_to") == k1(1).getAs[Long]("effective_from"))
    assert(k1(1).getAs[Long]("effective_to") == k1(2).getAs[Long]("effective_from"))
  }

  test("exactly one current row per key; singleton keys are current") {
    val h = Scd2.buildHistory(log, col("k"), col("ts"), col("eid"))
    val currents = h.where(col("is_current") === 1)
      .groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(currents == Map(1L -> 1L, 2L -> 1L))
    assert(h.where(col("is_current") === 1 && col("effective_to").isNotNull).count() == 0)
  }

  test("property: random logs produce abutting intervals, one current per key") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 5) {
      val rows = (0 until 60).map { i =>
        (rnd.nextInt(6).toLong, rnd.nextInt(20).toLong * 10, (trial * 1000 + i).toLong, s"p$i")
      }
      val h = Scd2.buildHistory(rows.toDF("k", "ts", "eid", "payload"),
        col("k"), col("ts"), col("eid")).collect()
      val byKey = h.groupBy(_.getLong(0))
      for ((k, versions) <- byKey) {
        val sorted = versions.sortBy(_.getAs[Int]("version"))
        // versions are 1..n dense
        assert(sorted.map(_.getAs[Int]("version")).toSeq == (1 to sorted.length))
        // intervals abut: to(i) == from(i+1); only the last is open/current
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(a.getAs[Long]("effective_to") == b.getAs[Long]("effective_from"))
            assert(a.getAs[Int]("is_current") == 0)
          case _ => ()
        }
        assert(sorted.last.getAs[Int]("is_current") == 1)
        assert(sorted.last.isNullAt(sorted.last.fieldIndex("effective_to")))
      }
      assert(byKey.values.map(_.length).sum == 60)
    }
  }

  test("same-timestamp changes order deterministically by the tiebreak") {
    val dup = Seq((1L, 100L, 2L, "later"), (1L, 100L, 1L, "earlier"))
      .toDF("k", "ts", "eid", "payload")
    val h = Scd2.buildHistory(dup, col("k"), col("ts"), col("eid"))
      .orderBy("version").collect()
    assert(h.map(_.getAs[String]("payload")).toSeq == Seq("earlier", "later"))
    assert(h.last.getAs[Int]("is_current") == 1)
  }
}
