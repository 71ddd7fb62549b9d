package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit semantics for the audit metrics on a hand-built table with every
  * defect class present (the cross-engine gate runs via dq1 on clean data,
  * where most metrics are legitimately zero — this spec proves the
  * detectors actually fire).
  */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("auditOrders counts every defect class exactly") {
    val orders = Seq(
      // (orderkey, custkey, status, totalprice, date)
      (1L, 10L, "O", 100.0, Some("1995-01-01")),
      (1L, 10L, "F", 50.0, Some("1995-01-02")),   // duplicate PK
      (2L, 11L, "X", 75.0, Some("1995-01-03")),   // bad status
      (3L, 99L, "P", -5.0, Some("1995-01-04")),   // orphan FK + non-positive
      (4L, 11L, "O", 20.0, None),                 // null date
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "s")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), to_date(col("s")).as("o_orderdate"))
    val customer = Seq(10L, 11L).toDF("c_custkey")

    val got = DataQuality.auditOrders(orders, customer)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map(
      "n_rows" -> 5L,
      "n_null_date" -> 1L,
      "n_dup_pk" -> 1L,
      "n_distinct_cust" -> 3L,
      "n_bad_status" -> 1L,
      "n_nonpos_total" -> 1L,
      "n_orphan_cust" -> 1L,
    ))
  }

  test("clean table audits to all-zero defect metrics") {
    val orders = Seq((1L, 10L, "O", 1.0, "1995-01-01"), (2L, 10L, "F", 2.0, "1995-01-02"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "s")
      .withColumn("o_orderdate", to_date(col("s")))
    val customer = Seq(10L).toDF("c_custkey")
    val got = DataQuality.auditOrders(orders, customer)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("n_rows") === 2L && got("n_distinct_cust") === 1L)
    Seq("n_null_date", "n_dup_pk", "n_bad_status", "n_nonpos_total", "n_orphan_cust")
      .foreach(m => assert(got(m) === 0L, m))
  }

  test("kAnonymity flags equivalence classes below k") {
    val people = Seq(
      ("us", "a"), ("us", "a"), ("us", "a"),
      ("us", "b"),
      ("de", "a"), ("de", "a"),
    ).toDF("country", "segment")
    val got = DataQuality.kAnonymity(people, Seq("country", "segment"), k = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got(("us", "a")) === ((3L, false)))
    assert(got(("us", "b")) === ((1L, true)))
    assert(got(("de", "a")) === ((2L, true)))
  }
}
