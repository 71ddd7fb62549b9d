package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def randomWeights(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i => (i.toLong, 1L + rnd.nextInt(100).toLong))
  }

  test("prefixSum equals the global-window running sum") {
    val df = randomWeights(5000, 7).toDF("id", "w").repartition(16)
    val got = Packing.prefixSum(df, Seq(col("id")), col("w"), "cum")
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val want = df.withColumn("cum", sum("w").over(
        Window.orderBy("id").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("prefixSum is partitioning-invariant") {
    val base = randomWeights(2000, 11).toDF("id", "w")
    val a = Packing.prefixSum(base.repartition(3), Seq(col("id")), col("w"), "cum")
      .select("id", "cum").as[(Long, Long)].collect().toSet
    val b = Packing.prefixSum(base.repartition(17), Seq(col("id")), col("w"), "cum")
      .select("id", "cum").as[(Long, Long)].collect().toSet
    assert(a === b)
  }

  test("packBins matches the sequential cumulative-offset definition") {
    val rows = randomWeights(3000, 23)
    val target = 512L
    val got = Packing.packBins(rows.toDF("id", "w").repartition(8),
        Seq(col("id")), col("w"), target)
      .select("id", "bin_id").as[(Long, Long)].collect().toMap
    var cum = 0L
    val want = rows.sortBy(_._1).map { case (id, w) =>
      val bin = cum / target
      cum += w
      id -> bin
    }.toMap
    assert(got === want)
  }

  test("negative weights are rejected, not silently binned") {
    val df = Seq((1L, 5L), (2L, -3L), (3L, 4L)).toDF("id", "w")
    val ex = intercept[Exception] {
      Packing.packBins(df, Seq(col("id")), col("w"), 8L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => String.valueOf(e.getMessage) +: messages(e.getCause))
    assert(messages(ex).exists(_.contains("non-negative")), ex.getMessage)
  }

  test("all-NULL-weight partitions sum to zero offset instead of NPE") {
    // ids 1..10 with NULL weights range-partition together: their
    // partition total is NULL pre-coalesce — the exact shape that NPE'd
    val df = (1 to 10).map(i => (i.toLong, Option.empty[Long]))
      .++((11 to 2000).map(i => (i.toLong, Some(1L))))
      .toDF("id", "w")
    val got = Packing.prefixSum(df.repartition(8), Seq(col("id")), col("w"), "cum")
      .where(col("id") > 10)
      .select("id", "cum").as[(Long, Long)].collect().toMap
    // null weights carry no mass: id 11 starts the running sum at 1
    assert(got(11L) === 1L && got(2000L) === 1990L)
  }

  test("bins are contiguous and capacity-respecting: a bin closes only once full") {
    val rows = randomWeights(3000, 31)
    val target = 512L
    val binStats = Packing.packBins(rows.toDF("id", "w").repartition(8),
        Seq(col("id")), col("w"), target)
      .groupBy("bin_id").agg(sum("w").as("tot"))
      .orderBy("bin_id")
      .as[(Long, Long)].collect()
    assert(binStats.map(_._1).toSeq === binStats.indices.map(_.toLong))
    // a bin closes only when the running corpus offset crosses its upper
    // boundary, so the cumulative total through every non-final bin must
    // reach (bin+1)*target (a single bin can still be small when a heavy
    // predecessor overflowed into it — the invariant is cumulative)
    var cum = 0L
    binStats.dropRight(1).foreach { case (bin, tot) =>
      cum += tot
      assert(cum >= (bin + 1) * target,
        s"bin $bin closed before the boundary: cumulative $cum < ${(bin + 1) * target}")
    }
  }
}
