package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (Morton code) exactly") {
    def morton(a: Long, b: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (10L, 6L), (65535L, 0L), (12345L, 54321L))
    val got = cases.toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == cases.map { case (a, b) => morton(a, b, 16) })
  }

  test("z-order monotone on each axis within fixed other-axis") {
    // for fixed b, z is strictly increasing in a (and vice versa) —
    // the property that makes Morton ranges map to rectangles
    val rows = (0L until 64L).toDF("a").withColumn("b", lit(7L))
    val zs = rows.select(ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(zs == zs.sorted && zs.distinct.size == zs.size)
  }

  /** Rows the parquet reader actually emitted for `df` (post row-group/
    * page pruning, pre record-level filtering).
    */
  private def scanOutputRows(df: DataFrame): Long = {
    // collect() (not count()) — count() builds a NEW aggregate query and
    // leaves this df's plan, and its metrics, untouched
    df.collect()
    val executed = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    executed.collectLeaves().collect {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }.sum
  }

  test("z-ordered layout skips files/row-groups for predicates on BOTH axes") {
    val n = 1 << 16
    // pseudo-random placement of a 256x256 grid so neither layout gets
    // accidental ordering for free
    val grid = spark.range(n).select(
      (pmod(xxhash64(col("id")), lit(256))).cast("int").as("x"),
      (pmod(xxhash64(col("id") + 1000000), lit(256))).cast("int").as("y"))
    val base = graft.tools.Scratch.dir("zorder").toString

    val linear = grid.repartitionByRange(16, col("x")).sortWithinPartitions("x", "y")
    linear.write.option("maxRecordsPerFile", 2048).parquet(s"$base/linear")
    ZOrder.cluster(grid, col("x"), col("y"), numPartitions = 16, bits = 8)
      .write.option("maxRecordsPerFile", 2048).parquet(s"$base/zorder")

    def box(path: String) = spark.read.parquet(path)
      .where(col("x") >= 0 && col("x") < 32 && col("y") >= 0 && col("y") < 32)
    def yOnly(path: String) = spark.read.parquet(path)
      .where(col("y") >= 0 && col("y") < 16)

    // same answers, different IO
    assert(box(s"$base/linear").count() == box(s"$base/zorder").count())
    assert(yOnly(s"$base/linear").count() == yOnly(s"$base/zorder").count())

    // 2D box: x-sorted layout prunes on x only; z-order prunes on both
    val linBox = scanOutputRows(box(s"$base/linear"))
    val zBox = scanOutputRows(box(s"$base/zorder"))
    assert(zBox < linBox, s"z-order read $zBox rows, linear read $linBox")

    // secondary-axis predicate: x-sorted layout cannot skip at all
    val linY = scanOutputRows(yOnly(s"$base/linear"))
    val zY = scanOutputRows(yOnly(s"$base/zorder"))
    assert(zY < linY, s"z-order read $zY rows, linear read $linY")
    // x-sorted layout has near-zero skipping power on y (not exactly n:
    // the odd page/row-group min/max misses a tiny y-range by luck)
    assert(linY > (n * 9L) / 10, s"expected ~no y-skipping on linear, read $linY of $n")
  }
}
