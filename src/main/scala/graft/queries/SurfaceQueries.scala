package graft.queries

import graft.Tables
import graft.functions.WeightedMean
import graft.operators.Skyline
import graft.streaming.SessionStream
import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-3 surface continuation: the UDAF tier (typed `Aggregator`),
  * generator surface (`stack` / `inline` — the UDTF-shaped built-ins),
  * XML parsing, the incremental partial-aggregate merge pattern that
  * powers materialized-view maintenance at warehouse scale, and a 2-D
  * skyline (Pareto dominance) operator.
  *
  * All oracle-gated; the usual cross-engine rules apply (exact integer
  * accumulators, single late double division, identical aliases).
  */
object SurfaceQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

    // UDAF surface: exact weighted mean as a typed Aggregator registered
    // for SQL. Partial aggregation is real: reduce() runs map-side,
    // merge() combines shuffle partials — same two-phase shape as the
    // built-in sum, so the shuffle carries one (num, den) pair per group,
    // not rows.
    "udaf1_weighted_mean" -> { (spark, dir) =>
      spark.udf.register("graft_wmean", F.udaf(WeightedMean.cents))
      Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_udaf")
      spark.sql("""
        SELECT l_returnflag,
               graft_wmean(CAST(floor(l_extendedprice * 100) AS BIGINT),
                           CAST(floor(l_quantity) AS BIGINT)) AS wavg_price
        FROM lineitem_udaf GROUP BY l_returnflag ORDER BY l_returnflag""")
    },

    // Incremental view maintenance: per-day partials (the stored state a
    // warehouse would persist and append to) merged up to month WITHOUT
    // rescanning the base table. Correct because the aggregate is a pair
    // of exact integer sums — associative, so partials compose; the
    // oracle computes the month rollup directly from base data.
    "inc1_incremental_agg" -> { (spark, dir) =>
      val partials = Tables.orders(spark, dir)
        .groupBy(
          to_date(col("o_orderdate")).as("day"),
          col("o_orderpriority").as("priority"))
        .agg(
          count(lit(1)).as("n"),
          sum(floor(col("o_totalprice") * 100).cast(LongType)).as("cents"))
      partials
        .groupBy(
          date_trunc("month", col("day")).cast(DateType).as("month"),
          col("priority"))
        .agg(sum("n").as("n_orders"), sum("cents").as("revenue_cents"))
        .orderBy("month", "priority")
    },

    // 2-D Pareto skyline (max size, max price): two window passes, local
    // then global — O(n log n) against the oracle's quadratic NOT EXISTS.
    "sky1_skyline" -> { (spark, dir) =>
      val pts = Tables.part(spark, dir)
        .where(col("p_brand") === "Brand#12")
        .select(
          col("p_partkey"),
          col("p_size").cast(LongType).as("p_size_l"),
          floor(col("p_retailprice") * 100).cast(LongType).as("price_cents"))
      Skyline.skyline2D(pts, "p_size_l", "price_cents").orderBy("p_partkey")
    },

    // Generator surface: stack() — the built-in UDTF that emits k rows
    // per input row (wide -> long without Dataset.unpivot).
    "g6_stack" -> { (spark, dir) =>
      Tables.orders(spark, dir)
        .where(col("o_orderkey") <= 500)
        .selectExpr(
          "o_orderkey",
          "stack(2, 'priority', o_orderpriority, 'status', o_orderstatus) AS (attr, val)")
        .orderBy("o_orderkey", "attr")
    },

    // Generator surface: inline() — explode an array of structs into
    // columns directly (the struct-typed UDTF shape).
    "g7_inline" -> { (spark, dir) =>
      Tables.nation(spark, dir)
        .selectExpr(
          "n_nationkey",
          """inline(array(
               named_struct('attr', 'name',   'val', n_name),
               named_struct('attr', 'region', 'val', CAST(n_regionkey AS STRING))))""")
        .orderBy("n_nationkey", "attr")
    },

    // Streaming: flatMapGroupsWithState — multi-row Append-mode state
    // emission (closed sessions flow out as later events prove the gap;
    // the open tail lives in state). The oracle rebuilds the same
    // sessions in SQL and drops each user's final (still-open) one.
    "st9_stream_closed_sessions" -> { (spark, dir) =>
      SessionStream.closedSessions(spark, dir)
    },

    // XML ingestion: from_xml over a deterministically-built payload;
    // the oracle parses the identical string with regexes, so the typed
    // extraction itself is what is being checked.
    "f11_xml" -> { (spark, dir) =>
      val xml = concat(
        lit("<r><name>"), col("n_name"),
        lit("</name><rk>"), col("n_regionkey"), lit("</rk></r>"))
      val schema = StructType(Seq(
        StructField("name", StringType),
        StructField("rk", LongType)))
      Tables.nation(spark, dir)
        .select(col("n_nationkey"), from_xml(xml, schema).as("x"))
        .select(
          col("n_nationkey"),
          col("x").getField("name").as("name"),
          col("x").getField("rk").as("rk"))
        .orderBy("n_nationkey")
    },
  )

  val oracles: Map[String, String] = Map(
    "udaf1_weighted_mean" ->
      """SELECT l_returnflag,
        |  (CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)
        |            * CAST(floor(l_quantity) AS BIGINT)) AS DOUBLE)
        |   / CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS DOUBLE)) / 100.0
        |    AS wavg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "inc1_incremental_agg" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |  o_orderpriority AS priority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "sky1_skyline" ->
      """WITH pts AS (
        |  SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size_l,
        |         CAST(floor(p_retailprice * 100) AS BIGINT) AS price_cents
        |  FROM part WHERE p_brand = 'Brand#12')
        |SELECT p.p_partkey, p.p_size_l, p.price_cents FROM pts p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pts q
        |  WHERE q.p_size_l >= p.p_size_l AND q.price_cents >= p.price_cents
        |    AND (q.p_size_l > p.p_size_l OR q.price_cents > p.price_cents))
        |ORDER BY p_partkey""".stripMargin,
    "g6_stack" ->
      """SELECT o_orderkey, 'priority' AS attr, o_orderpriority AS val
        |FROM orders WHERE o_orderkey <= 500
        |UNION ALL
        |SELECT o_orderkey, 'status' AS attr, o_orderstatus AS val
        |FROM orders WHERE o_orderkey <= 500
        |ORDER BY o_orderkey, attr""".stripMargin,
    "st9_stream_closed_sessions" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) AS tns, event_id FROM events),
        |m AS (
        |  SELECT user_id, tns, event_id,
        |    CASE WHEN lag(tns) OVER w IS NULL
        |           OR tns - lag(tns) OVER w > 1800000000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id)),
        |g AS (
        |  SELECT user_id, tns,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY tns, event_id
        |                      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m),
        |s AS (
        |  SELECT user_id, sid, min(tns) AS start_ns, max(tns) AS end_ns,
        |         count(*) AS n_events
        |  FROM g GROUP BY 1, 2),
        |s2 AS (
        |  SELECT *, max(sid) OVER (PARTITION BY user_id) AS max_sid FROM s)
        |SELECT user_id,
        |  start_ns // 1000000 AS session_start_ms,
        |  end_ns // 1000000 AS session_end_ms,
        |  n_events
        |FROM s2 WHERE sid < max_sid
        |ORDER BY user_id, session_start_ms""".stripMargin,
    "g7_inline" ->
      """SELECT n_nationkey, 'name' AS attr, n_name AS val FROM nation
        |UNION ALL
        |SELECT n_nationkey, 'region' AS attr, CAST(n_regionkey AS VARCHAR) AS val
        |FROM nation
        |ORDER BY n_nationkey, attr""".stripMargin,
    "f11_xml" ->
      """WITH x AS (
        |  SELECT n_nationkey,
        |    '<r><name>' || n_name || '</name><rk>'
        |      || CAST(n_regionkey AS VARCHAR) || '</rk></r>' AS xml
        |  FROM nation)
        |SELECT n_nationkey,
        |  regexp_extract(xml, '<name>(.*)</name>', 1) AS name,
        |  CAST(regexp_extract(xml, '<rk>([0-9]+)</rk>', 1) AS BIGINT) AS rk
        |FROM x ORDER BY n_nationkey""".stripMargin,
  )
}
