package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val quotes = Seq(
    // key, ts, price
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 9.0),
  ).toDF("sym", "ts", "price")

  private val trades = Seq(
    ("A", 5L, 100L),  // before any quote -> no match
    ("A", 20L, 101L), // exactly at quote ts -> inclusive match (2.0)
    ("A", 25L, 102L), // between -> 2.0
    ("A", 99L, 103L), // after all -> 3.0
    ("B", 14L, 104L), // before B's only quote -> no match
    ("C", 50L, 105L), // key with no quotes at all -> no match
  ).toDF("sym", "ts", "trade_id")

  test("inner as-of: nearest preceding (inclusive) quote per trade") {
    val res = AsOfJoin.asof(trades, quotes, Seq("sym"), "ts", "ts")
      .orderBy("sym", "ts")
      .collect()
      .map(r => (r.getAs[String]("sym"), r.getAs[Long]("ts"),
        r.getAs[Long]("trade_id"), r.getAs[Double]("asof_price")))
    assert(res.toSeq == Seq(
      ("A", 20L, 101L, 2.0),
      ("A", 25L, 102L, 2.0),
      ("A", 99L, 103L, 3.0),
    ))
  }

  test("forward as-of: nearest following (inclusive) quote per trade") {
    val res = AsOfJoin.asofForward(trades, quotes, Seq("sym"), "ts", "ts")
      .orderBy("sym", "ts")
      .collect()
      .map(r => (r.getAs[String]("sym"), r.getAs[Long]("ts"),
        r.getAs[Long]("trade_id"), r.getAs[Double]("asof_price")))
    assert(res.toSeq == Seq(
      ("A", 5L, 100L, 1.0),   // before any quote -> first quote (10)
      ("A", 20L, 101L, 2.0),  // exactly at quote ts -> inclusive
      ("A", 25L, 102L, 3.0),  // between -> next (30)
      ("B", 14L, 104L, 9.0),  // before B's only quote -> it (15)
      // A@99 (after all) and C (no quotes) drop under inner semantics
    ))
  }

  test("forward outer as-of keeps left rows with nothing following") {
    val res = AsOfJoin.asofForward(trades, quotes, Seq("sym"), "ts", "ts",
      inner = false)
    assert(res.count() == 6)
    assert(res.where("asof_price IS NULL").count() == 2) // A@99, C@50
  }

  test("left rows with null timestamps never match, in either direction") {
    val t = Seq(("A", Option.empty[Long], 200L)).toDF("sym", "ts", "trade_id")
    assert(AsOfJoin.asof(t, quotes, Seq("sym"), "ts", "ts").count() == 0)
    assert(AsOfJoin.asofForward(t, quotes, Seq("sym"), "ts", "ts").count() == 0)
    val outer = AsOfJoin.asofForward(t, quotes, Seq("sym"), "ts", "ts", inner = false)
    assert(outer.count() == 1 && outer.where("asof_price IS NULL").count() == 1)
  }

  test("right rows with null timestamps never match") {
    val q = Seq((Some("A"), Option.empty[java.lang.Long], Some(5.0)))
      .toDF("sym", "ts", "price")
    val t = Seq(("A", 10L, 1L)).toDF("sym", "ts", "trade_id")
    assert(AsOfJoin.asof(t, q, Seq("sym"), "ts", "ts").count() == 0)
    val outer = AsOfJoin.asof(t, q, Seq("sym"), "ts", "ts", inner = false).collect()
    assert(outer.length == 1 && outer.head.isNullAt(outer.head.fieldIndex("asof_price")))
  }

  test("colliding output names are rejected up front") {
    val t = Seq(("A", 10L, 5.0)).toDF("sym", "ts", "asof_price")
    val q = Seq(("A", 1L, 1.0)).toDF("sym", "ts", "price")
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(t, q, Seq("sym"), "ts", "ts")
    }
  }

  test("outer as-of keeps unmatched left rows with null right payload") {
    val res = AsOfJoin.asof(trades, quotes, Seq("sym"), "ts", "ts", inner = false)
    assert(res.count() == 6)
    assert(res.where("asof_price IS NULL").count() == 3)
  }

  test("map-typed right payload still joins (tiebreak falls back gracefully)") {
    import org.apache.spark.sql.functions.{col, lit, map}
    val left = Seq((1L, 10L, "a")).toDF("k", "ts", "lval")
    val right = Seq((1L, 5L)).toDF("k", "ts")
      .withColumn("attrs", map(lit("x"), lit("y")))
    val out = AsOfJoin.asof(left, right, Seq("k"), "ts", "ts")
    assert(out.count() == 1, "maps are unorderable; asof must not require sorting them")
    assert(out.select(col("asof_ts")).collect().head.getLong(0) == 5L)
  }
}
