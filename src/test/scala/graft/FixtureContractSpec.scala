package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The contract between the engine and the driver-generated fixtures.
  *
  * Round 4 lost 57 queries because the regenerated `events.parquet`
  * silently switched its `ts` physical encoding from TIMESTAMP(NANOS)
  * (read as long under `nanosAsLong`) to TIMESTAMP(MICROS) (read as
  * TIMESTAMP_NTZ) and the engine assumed the former. This spec pins the
  * contract at test time instead of at the driver's end-of-round run:
  *
  *  1. every fixture table opens and exposes the columns queries rely on;
  *  2. `Tables.events` normalizes `ts` to long nanos whatever the physical
  *     unit — asserted against the shipped fixture AND a locally-written
  *     twin in each alternate encoding (micros-timestamp and long-nanos).
  */
class FixtureContractSpec extends SparkSpec {
  private val expectedCols: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey", "r_name"),
    "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal"),
    "supplier" -> Seq("s_suppkey", "s_nationkey"),
    "part" -> Seq("p_partkey", "p_type"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_discount", "l_returnflag", "l_shipdate"),
    "events" -> Seq("event_id", "user_id", "event_type", "ts", "value", "props"),
    "documents" -> Seq("doc_id", "text", "source", "lang"),
    "embeddings" -> Seq("vec_id", "embedding", "label"),
  )

  for ((table, cols) <- expectedCols.toSeq.sortBy(_._1)) {
    test(s"$table opens and carries its contract columns") {
      val df = Tables.t(spark, sf0001, table)
      val have = df.columns.toSet
      val missing = cols.filterNot(have)
      assert(missing.isEmpty, s"$table missing columns: $missing (has $have)")
      assert(df.limit(1).count() == 1, s"$table is empty")
    }
  }

  test("Tables.events normalizes the SHIPPED fixture to long-nanos ts + ts_sec") {
    val ev = Tables.events(spark, sf0001)
    assert(ev.schema("ts").dataType == LongType,
      s"ts must leave Tables.events as long nanos, got ${ev.schema("ts").dataType}")
    assert(ev.schema("ts_sec").dataType == TimestampType)
    // nanos magnitude sanity: the fixture's span is 2024+, i.e. > 1.7e18 ns
    val row = ev.agg(min(col("ts")).as("lo"), max(col("ts")).as("hi")).head()
    assert(row.getLong(0) > 1500000000L * 1000000000L,
      s"ts lower bound ${row.getLong(0)} is not epoch-nanos scale")
    // ts_sec is exactly ts floored to seconds
    val bad = ev.where(
      unix_seconds(col("ts_sec")) =!= expr("ts div 1000000000")).count()
    assert(bad == 0, s"$bad rows where ts_sec != floor(ts)")
  }

  test("normalizeEventTs accepts BOTH physical encodings identically") {
    import spark.implicits._
    val dirM = java.nio.file.Files.createTempDirectory("fixture-micros").toString
    val dirN = java.nio.file.Files.createTempDirectory("fixture-nanos").toString
    try {
      // the same three instants, written once as TIMESTAMP (micros in
      // parquet) and once as raw long nanos — the two encodings the driver
      // has shipped so far
      val nanos = Seq(
        1704067200000000000L, // 2024-01-01 00:00:00
        1704067201500000000L, // ...:01.5
        1719792000123456000L) // 2024-07-01 00:00:00.123456
      nanos.toDF("ns")
        // NTZ mirrors the driver's parquet exactly (isAdjustedToUTC=false)
        .select(timestamp_micros(expr("ns div 1000"))
          .cast(TimestampNTZType).as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dirM/events.parquet")
      nanos.toDF("ts")
        .coalesce(1).write.mode("overwrite").parquet(s"$dirN/events.parquet")

      val fromMicros = Tables.normalizeEventTs(
        spark.read.parquet(s"$dirM/events.parquet"))
      val fromNanos = Tables.normalizeEventTs(
        spark.read.parquet(s"$dirN/events.parquet"))
      assert(fromMicros.schema("ts").dataType == LongType)
      assert(fromNanos.schema("ts").dataType == LongType)
      val got = fromMicros.orderBy("ts").as[Long].collect().toSeq
      val ref = fromNanos.orderBy("ts").as[Long].collect().toSeq
      assert(ref == nanos.sorted)
      assert(got == nanos.sorted,
        s"micros-encoded fixture did not normalize to the same nanos: $got")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(dirM)); rm(new java.io.File(dirN))
    }
  }
}
