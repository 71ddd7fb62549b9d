package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQL-registered bloom pair (graft_bloom_agg / graft_might_contain —
  * Catalyst's own semi-join-reduction expressions, exposed through
  * GraftExtensions). The load-bearing property is NO FALSE NEGATIVES:
  * pre-filtering a probe side with the bloom never drops a true match,
  * so bloom-then-join equals plain join exactly.
  */
class BloomSqlSpec extends SparkSpec {
  import spark.implicits._

  test("graft_might_contain has no false negatives over the built key set") {
    spark.range(0, 200, 2).select(col("id")).createOrReplaceTempView("bloom_build")
    spark.range(0, 200).select(col("id")).createOrReplaceTempView("bloom_probe")
    val rows = spark.sql(
      """SELECT id, graft_might_contain(
        |  (SELECT graft_bloom_agg(id, 1000L, 20000L) FROM bloom_build), id) AS hit
        |FROM bloom_probe""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // every built (even) key MUST hit; odd keys may false-positive but
    // with 20k bits for 100 keys the filter should reject most of them.
    (0L until 200L by 2).foreach(k => assert(rows(k), s"false negative at $k"))
    val falsePos = (1L until 200L by 2).count(rows(_))
    assert(falsePos < 20, s"implausible false-positive rate: $falsePos/100")
  }

  test("bloom-prefiltered join equals the plain join") {
    Seq((1L, "x"), (2L, "y"), (3L, "z"), (4L, "w"))
      .toDF("k", "dim").createOrReplaceTempView("bloom_dim")
    spark.range(0, 1000).select((col("id") % 10).as("k"), col("id").as("payload"))
      .createOrReplaceTempView("bloom_fact")
    val bloomed = spark.sql(
      """SELECT f.k, COUNT(*) AS n FROM bloom_fact f JOIN bloom_dim d ON f.k = d.k
        |WHERE graft_might_contain(
        |  (SELECT graft_bloom_agg(k, 100L, 2000L) FROM bloom_dim), f.k)
        |GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    val plain = spark.sql(
      """SELECT f.k, COUNT(*) AS n FROM bloom_fact f JOIN bloom_dim d ON f.k = d.k
        |GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    assert(bloomed.toSeq === plain.toSeq)
  }
}
