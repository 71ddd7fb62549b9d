package graft

import org.apache.spark.sql.functions._

/** The engine has no SQL parser of its own — Catalyst IS the SQL front
  * door. This spec registers the star schema as views and runs
  * representative queries as raw SQL, asserting parity with the
  * DataFrame-API equivalents (including our registered native function).
  */
class SqlFrontDoorSpec extends SparkSpec {

  private lazy val views: Unit = {
    for (t <- Seq("lineitem", "orders", "customer", "embeddings"))
      Tables.t(spark, sf0001, t).createOrReplaceTempView(t)
  }

  test("aggregation via SQL matches the DataFrame API") {
    views
    val sql = spark.sql(
      """SELECT l_returnflag, SUM(l_quantity) AS sum_qty, COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    val api = Tables.lineitem(spark, sf0001)
      .groupBy("l_returnflag")
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect()
    assert(sql.map(_.toSeq).toSeq == api.map(_.toSeq).toSeq)
  }

  test("join + window via SQL matches the DataFrame query") {
    views
    val sql = spark.sql(
      """SELECT c_mktsegment, rank, o_orderkey FROM (
        |  SELECT c.c_mktsegment, o.o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
        |      ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rank
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |) WHERE rank <= 3 ORDER BY c_mktsegment, rank""".stripMargin).collect()
    val api = SparkEntry.queries("w1_window_topk")(spark, sf0001)
      .select("c_mktsegment", "rank", "o_orderkey").collect()
    assert(sql.map(_.toSeq).toSeq == api.map(_.toSeq).toSeq)
  }

  test("native cosine function usable in a SQL similarity query") {
    views
    val top = spark.sql(
      """SELECT a.vec_id AS q, b.vec_id AS c,
        |  quantized_cosine(a.embedding, b.embedding) AS sim
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id < 5 ORDER BY q""".stripMargin).collect()
    assert(top.length == 5)
    top.foreach(r => assert(math.abs(r.getAs[Double]("sim")) <= 1.0 + 1e-12))
  }

  test("lsh_buckets and pq_encode usable from SQL, matching the Column API") {
    views
    val sqlLsh = spark.sql(
      """SELECT vec_id, lsh_buckets(embedding, 4, 4) AS b
        |FROM embeddings WHERE vec_id < 5 ORDER BY vec_id""".stripMargin).collect()
    val apiLsh = Tables.embeddings(spark, sf0001).where(col("vec_id") < 5)
      .select(col("vec_id"),
        graft.functions.LshBuckets.buckets(col("embedding"), 4, 4).as("b"))
      .orderBy("vec_id").collect()
    assert(sqlLsh.map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq ==
      apiLsh.map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq)

    val sqlPq = spark.sql(
      """WITH cb AS (
        |  SELECT collect_list(q) AS cbv FROM (
        |    SELECT transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1048576.0) AS BIGINT)) AS q
        |    FROM embeddings ORDER BY vec_id LIMIT 8)
        |)
        |SELECT e.vec_id, pq_encode(e.embedding, cb.cbv, 8) AS codes
        |FROM embeddings e CROSS JOIN cb WHERE e.vec_id < 5
        |ORDER BY e.vec_id""".stripMargin).collect()
    assert(sqlPq.length == 5)
    sqlPq.foreach { r =>
      val codes = r.getSeq[Long](1)
      assert(codes.length == 8 && codes.forall(j => j >= 0 && j < 8), r)
    }
    // non-literal structural args are rejected, not silently mis-planned
    val err = intercept[Exception] {
      spark.sql("SELECT pq_encode(embedding, array(array(1L)), CAST(vec_id AS INT)) FROM embeddings").collect()
    }
    assert(err.getMessage.contains("INTEGER literal"))
  }
}
