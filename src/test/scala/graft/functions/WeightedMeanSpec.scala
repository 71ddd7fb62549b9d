package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

class WeightedMeanSpec extends SparkSpec {
  import spark.implicits._

  private val wm = F.udaf(WeightedMean.cents)

  test("weighted mean is exact and partition-invariant") {
    val rows = Seq((100L, 1L), (200L, 3L), (350L, 2L)) // cents, weight
    val expected = ((100.0 * 1 + 200 * 3 + 350 * 2) / 6.0) / 100.0
    for (parts <- Seq(1, 3)) {
      val got = rows.toDF("cents", "w")
        .repartition(parts)
        .agg(wm($"cents", $"w").as("m"))
        .head().getDouble(0)
      assert(got === expected)
    }
  }

  test("zero total weight yields null, not a division artifact") {
    val got = Seq((100L, 0L)).toDF("cents", "w")
      .agg(wm($"cents", $"w").as("m"))
      .head()
    assert(got.isNullAt(0))
  }

  test("SQL registration works (the UDAF surface)") {
    spark.udf.register("graft_wmean_spec", F.udaf(WeightedMean.cents))
    Seq((500L, 2L), (700L, 2L)).toDF("c", "w").createOrReplaceTempView("wm_spec")
    val got = spark.sql("SELECT graft_wmean_spec(c, w) AS m FROM wm_spec")
      .head().getDouble(0)
    assert(got === 6.0)
  }
}
