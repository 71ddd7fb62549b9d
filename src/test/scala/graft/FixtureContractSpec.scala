package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The contract between the engine and the driver-generated fixtures.
  *
  * Round 4 lost 57 queries because the regenerated `events.parquet`
  * silently switched its `ts` physical encoding from TIMESTAMP(NANOS)
  * (read as long under `nanosAsLong`) to TIMESTAMP(MICROS) (read as
  * TIMESTAMP_NTZ) and the engine assumed the former. This spec pins the
  * contract for EVERY fixture table at test time instead of at the
  * driver's end-of-round run:
  *
  *  1. every table opens through its `Tables.*` loader and exposes the
  *     columns queries rely on, each in its SEMANTIC type class
  *     (integral / fractional / string / date-or-timestamp / float
  *     array) — classes, not exact physical types, so a unit-preserving
  *     regeneration (int32↔int64, float↔double, NTZ↔LTZ) passes while a
  *     semantic break (dropped column, string-typed key) fails loudly;
  *  2. the same contract holds on a locally-written alternate-encoding
  *     TWIN of every table (each flippable dtype flipped), proving the
  *     loaders tolerate the drift the driver has actually shipped;
  *  3. `Tables.events` normalizes `ts` to long nanos whatever the
  *     physical unit — against the shipped fixture AND both alternate
  *     encodings (micros-timestamp and long-nanos).
  */
class FixtureContractSpec extends SparkSpec {

  // ---- semantic type classes -------------------------------------------
  private sealed trait Cls { def ok(dt: DataType): Boolean; def name: String }
  private case object Integral extends Cls {
    def ok(dt: DataType): Boolean = dt match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
      case _ => false
    }
    val name = "integral"
  }
  private case object Fractional extends Cls {
    def ok(dt: DataType): Boolean = dt match {
      case _: FloatType | _: DoubleType | _: DecimalType => true
      case _ => false
    }
    val name = "fractional"
  }
  private case object Str extends Cls {
    def ok(dt: DataType): Boolean = dt == StringType
    val name = "string"
  }
  private case object TsLike extends Cls {
    def ok(dt: DataType): Boolean = dt match {
      case _: DateType | _: TimestampType | _: TimestampNTZType => true
      case _ => false
    }
    val name = "date/timestamp"
  }
  private case object FloatArray extends Cls {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val name = "array<float|double>"
  }

  // Contract: the columns queries rely on, per table, with their class.
  // (Extra fixture columns are allowed; missing or misclassed ones fail.)
  private val contract: Map[String, Map[String, Cls]] = Map(
    "region" -> Map("r_regionkey" -> Integral, "r_name" -> Str),
    "nation" -> Map("n_nationkey" -> Integral, "n_name" -> Str,
      "n_regionkey" -> Integral),
    "customer" -> Map("c_custkey" -> Integral, "c_name" -> Str,
      "c_nationkey" -> Integral, "c_acctbal" -> Fractional,
      "c_mktsegment" -> Str),
    "supplier" -> Map("s_suppkey" -> Integral, "s_name" -> Str,
      "s_nationkey" -> Integral, "s_acctbal" -> Fractional),
    "part" -> Map("p_partkey" -> Integral, "p_name" -> Str, "p_brand" -> Str,
      "p_type" -> Str, "p_size" -> Integral, "p_retailprice" -> Fractional),
    "orders" -> Map("o_orderkey" -> Integral, "o_custkey" -> Integral,
      "o_orderstatus" -> Str, "o_totalprice" -> Fractional,
      "o_orderdate" -> TsLike, "o_orderpriority" -> Str),
    "lineitem" -> Map("l_orderkey" -> Integral, "l_partkey" -> Integral,
      "l_suppkey" -> Integral, "l_linenumber" -> Integral,
      "l_quantity" -> Fractional, "l_extendedprice" -> Fractional,
      "l_discount" -> Fractional, "l_tax" -> Fractional,
      "l_returnflag" -> Str, "l_linestatus" -> Str, "l_shipdate" -> TsLike),
    "documents" -> Map("doc_id" -> Integral, "text" -> Str, "lang" -> Str,
      "source" -> Str, "n_chars" -> Integral),
    "embeddings" -> Map("vec_id" -> Integral, "embedding" -> FloatArray,
      "label" -> Integral),
    // events is read through Tables.events: whatever the physical `ts`
    // encoding, the contract is the NORMALIZED shape (long nanos + ts_sec)
    "events" -> Map("event_id" -> Integral, "user_id" -> Integral,
      "event_type" -> Str, "ts" -> Integral, "ts_sec" -> TsLike,
      "value" -> Fractional, "props" -> Str),
  )

  private def load(dir: String, table: String): DataFrame =
    if (table == "events") Tables.events(spark, dir)
    else Tables.t(spark, dir, table)

  private def assertContract(dir: String, table: String, where: String): Unit = {
    val df = load(dir, table)
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    for ((c, cls) <- contract(table).toSeq.sortBy(_._1)) {
      val dt = types.getOrElse(c,
        fail(s"[$where] $table missing column $c (has ${types.keys.toSeq.sorted})"))
      assert(cls.ok(dt), s"[$where] $table.$c is $dt, expected ${cls.name}")
    }
    assert(df.limit(1).count() == 1, s"[$where] $table is empty")
  }

  for (table <- contract.keys.toSeq.sorted) {
    test(s"$table opens via Tables.* and carries its contract columns/classes") {
      assertContract(sf0001, table, "shipped")
    }
  }

  test("the contract survives an alternate-encoding twin of EVERY table") {
    // Rewrite each table with every flippable dtype flipped —
    // int32↔int64, float↔double, NTZ↔LTZ timestamp, float↔double array
    // elements — then re-assert the full contract on the twin directory.
    // This is the drift the driver has actually shipped (r4: events.ts
    // nanos→micros) applied to every table at once: loaders and class
    // checks must tolerate all of it.
    def flip(dt: DataType): DataType = dt match {
      case IntegerType => LongType
      case LongType => IntegerType // sf0.001 values all fit int32
      case DoubleType => FloatType
      case FloatType => DoubleType
      case TimestampNTZType => TimestampType
      case TimestampType => TimestampNTZType
      case ArrayType(FloatType, n) => ArrayType(DoubleType, n)
      case ArrayType(DoubleType, n) => ArrayType(FloatType, n)
      case other => other
    }
    val twinDir = graft.tools.Scratch.dir("fixture-twin").toString
    try {
      for (table <- contract.keys.toSeq.sorted) {
        val raw = Tables.t(spark, sf0001, table)
        val flipped = raw.select(raw.schema.fields.toSeq.map { f =>
          // never narrow a long-nanos ts: if the driver ships events.ts
          // as raw nanos again, int32 can't hold it — leave it alone
          // (the nanos encoding is covered by the dedicated test below)
          if (table == "events" && f.name == "ts" && Integral.ok(f.dataType))
            col(f.name)
          else col(f.name).cast(flip(f.dataType)).as(f.name)
        }: _*)
        flipped.coalesce(1).write.mode("overwrite")
          .parquet(s"$twinDir/$table.parquet")
      }
      for (table <- contract.keys.toSeq.sorted)
        assertContract(twinDir, table, "twin")
      // and the normalization invariant holds on the twin's events too
      val ev = Tables.events(spark, twinDir)
      assert(ev.schema("ts").dataType == LongType)
      val bad = ev.where(
        unix_seconds(col("ts_sec")) =!= expr("ts div 1000000000")).count()
      assert(bad == 0, s"twin events: $bad rows where ts_sec != floor(ts)")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(twinDir))
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
    val dirM = graft.tools.Scratch.dir("fixture-micros").toString
    val dirN = graft.tools.Scratch.dir("fixture-nanos").toString
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
