package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** RewriteRankFilterToTopK: the rank-filter window idiom plans as the
  * bounded-heap TopKPerKey operator (and only when the rewrite is
  * semantics-preserving).
  */
class RankRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(): Unit = {
    val rnd = new scala.util.Random(5)
    (1 to 4000).map(i => (i.toLong, s"k${rnd.nextInt(23)}", rnd.nextInt(10000)))
      .toDF("id", "key", "v").createOrReplaceTempView("rr_t")
  }

  private val topkSql = """
    SELECT key, id, v FROM (
      SELECT *, row_number() OVER (PARTITION BY key ORDER BY v DESC, id) AS rn
      FROM rr_t) WHERE rn <= 3"""

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def withRewrite[A](on: Boolean)(f: => A): A = {
    val prev = spark.conf.getOption("spark.graft.topk.rewrite")
    spark.conf.set("spark.graft.topk.rewrite", on.toString)
    try f finally prev match {
      case Some(v) => spark.conf.set("spark.graft.topk.rewrite", v)
      case None => spark.conf.unset("spark.graft.topk.rewrite")
    }
  }

  test("rank filter plans as TopKPerKeyExec and matches the Window result") {
    fixture()
    val (rewritten, rewrittenPlan) = withRewrite(true) {
      val df = spark.sql(topkSql)
      (df.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet,
        planOf(df))
    }
    val (baseline, baselinePlan) = withRewrite(false) {
      val df = spark.sql(topkSql)
      (df.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet,
        planOf(df))
    }
    assert(rewrittenPlan.contains("TopKPerKey"), rewrittenPlan)
    assert(!rewrittenPlan.contains("Window"), rewrittenPlan)
    assert(!baselinePlan.contains("TopKPerKey"), baselinePlan)
    assert(rewritten === baseline)
    assert(rewritten.size === 23 * 3)
  }

  test("rn = 1 (latest-per-key idiom) rewrites with k = 1") {
    fixture()
    withRewrite(true) {
      val df = spark.sql("""
        SELECT key, id, v FROM (
          SELECT *, row_number() OVER (PARTITION BY key ORDER BY v DESC, id) AS rn
          FROM rr_t) WHERE rn = 1""")
      assert(planOf(df).contains("TopKPerKey"))
      val rows = df.collect()
      assert(rows.length === 23)
    }
  }

  test("expression order keys rewrite too (heap evaluates them per comparison)") {
    fixture()
    withRewrite(true) {
      val df = spark.sql("""
        SELECT key, id FROM (
          SELECT *, row_number() OVER (PARTITION BY key ORDER BY v * 2 + 1 DESC, id) AS rn
          FROM rr_t) WHERE rn <= 2""")
      assert(planOf(df).contains("TopKPerKey"), planOf(df))
      assert(df.count() === 23 * 2)
    }
  }

  test("projected rank rewrites too — the heap emits the ordinal") {
    fixture()
    val rankSql = """
      SELECT key, id, v, rn FROM (
        SELECT *, row_number() OVER (PARTITION BY key ORDER BY v DESC, id) AS rn
        FROM rr_t) WHERE rn <= 3"""
    def rows(df: DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    val (rewritten, rewrittenPlan) = withRewrite(true) {
      val df = spark.sql(rankSql); (rows(df), planOf(df))
    }
    val baseline = withRewrite(false)(rows(spark.sql(rankSql)))
    assert(rewrittenPlan.contains("TopKPerKey"), rewrittenPlan)
    assert(!rewrittenPlan.contains("Window"), rewrittenPlan)
    // rank VALUES must match the window formulation exactly (the order
    // here is total, so there is no tie arbitrariness to hide behind)
    assert(rewritten === baseline)
  }

  test("projected rank in an expression (rn used downstream) still rewrites") {
    fixture()
    withRewrite(true) {
      val df = spark.sql("""
        SELECT key, id, rn * 10 AS rx FROM (
          SELECT *, row_number() OVER (PARTITION BY key ORDER BY v DESC, id) AS rn
          FROM rr_t) WHERE rn <= 2""")
      assert(planOf(df).contains("TopKPerKey"), planOf(df))
      val rx = df.collect().map(_.getInt(2)).toSet
      assert(rx === Set(10, 20))
    }
  }

  test("no rewrite for rank()/dense_rank() (tie fan-out differs from row_number)") {
    fixture()
    withRewrite(true) {
      val df = spark.sql("""
        SELECT key, id FROM (
          SELECT *, rank() OVER (PARTITION BY key ORDER BY v DESC, id) AS rn
          FROM rr_t) WHERE rn <= 3""")
      assert(!planOf(df).contains("TopKPerKey"))
    }
  }
}
