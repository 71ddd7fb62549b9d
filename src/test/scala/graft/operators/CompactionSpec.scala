package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {

  private def tmp(p: String) = graft.tools.Scratch.dir(p).toString

  test("compaction collapses a many-file directory and preserves content") {
    val src = tmp("compact-src") + "/t"
    val dst = tmp("compact-dst") + "/t"
    // 32 tiny files
    spark.range(10000).select(col("id"), (col("id") % 7).as("k"))
      .repartition(32)
      .write.parquet(src)
    val total = Compaction.dataFiles(spark, src).map(_._2).sum
    val (before, after) = Compaction.compact(spark, src, dst, targetBytes = total / 2 + 1)
    assert(before === 32)
    assert(after <= 4, s"expected ≤4 files after compaction, got $after")
    // content survives exactly
    val a = spark.read.parquet(src)
    val b = spark.read.parquet(dst)
    assert(b.count() === 10000)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("target larger than the table compacts to a single file") {
    val src = tmp("compact-one") + "/t"
    val dst = tmp("compact-one-dst") + "/t"
    spark.range(100).repartition(8).write.parquet(src)
    val (_, after) = Compaction.compact(spark, src, dst, targetBytes = Long.MaxValue)
    assert(after === 1)
    assert(spark.read.parquet(dst).count() === 100)
  }
}
