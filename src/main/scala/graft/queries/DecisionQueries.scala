package graft.queries

import graft.Tables
import graft.operators.Packing
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Decision-support plan shapes beyond tq5/tq10/tq21, plus exact model-
  * evaluation analytics (AUC, decile lift) computed relationally.
  *
  * The TPC-H-shaped queries each exercise a DISTINCT planner stress:
  * tq3 a top-N over a 3-way join (TakeOrdered, no global sort), tq7 a
  * disjunctive cross-dimension predicate, tq9 a 5-way star with exact
  * integer profit, tq12 a fact-fact conditional-count join, tq13 an
  * outer join with a join-condition filter feeding a double
  * aggregation, tq14 a conditional-share single row, tq15 a
  * max-of-aggregate selection, tq16 an anti-excluded distinct count,
  * tq17 a decorrelated per-part scalar subquery with an integer-exact
  * half-average cutoff, tq18 a HAVING-filtered aggregate driving the
  * fact join, tq19 the OR-of-ANDs predicate kept as one filter, tq22 a
  * scalar-aggregate comparison plus anti join. All revenue arithmetic uses the shared exact integer
  * encodings (QueryExprs.revQ / round-cents), so every cutoff and share
  * is bit-identical vs the DuckDB oracle.
  *
  * ml1/ml2 are the "is this filter predictive?" primitives a training-
  * data pipeline runs constantly (quality-score vs downstream label):
  * exact Mann–Whitney AUC via the distributed two-pass prefix sum
  * (Packing.prefixSum — no single-partition global window), and decile
  * lift via broadcast percentile thresholds (no global ntile sort).
  */
object DecisionQueries {

  private def revQ = QueryExprs.revQ

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q7 shape: bilateral trade volume between a fixed nation set —
    // the disjunctive (n1, n2) predicate Catalyst must NOT turn into a
    // cartesian. Both nation sides are filtered tiny and broadcast;
    // lineitem shuffles once on l_orderkey to meet orders.
    "tq7_cross_nation_volume" -> { (spark, dir) =>
      // nation set chosen to have BOTH suppliers and customers at every
      // fixture SF (sf0.001 has only 10 suppliers, none in nations 0-2)
      val nat = Seq("NATION_3", "NATION_8", "NATION_12")
      val n1 = Tables.nation(spark, dir).where(col("n_name").isin(nat: _*))
        .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(spark, dir).where(col("n_name").isin(nat: _*))
        .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
      val s = Tables.supplier(spark, dir).join(broadcast(n1), col("s_nationkey") === col("sk"))
        .select("s_suppkey", "supp_nation")
      val c = Tables.customer(spark, dir).join(broadcast(n2), col("c_nationkey") === col("ck"))
        .select("c_custkey", "cust_nation")
      val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
      val l = Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
      l.join(s, col("s_suppkey") === col("l_suppkey"))
        .join(o, col("o_orderkey") === col("l_orderkey"))
        .join(c, col("c_custkey") === col("o_custkey"))
        .where(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
        .agg((sum(revQ).cast(DoubleType) / 1000000.0).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // Q1 in full: the pricing summary with all eight aggregates — sums
    // in exact integer cents/basis points (DECIMAL(38,0) accumulators),
    // averages as ONE late division of exact sums, so every column is
    // bit-identical cross-engine. One scan, map-side partials, 6 rows.
    "tq1_pricing_summary" -> { (spark, dir) =>
      val d38 = DecimalType(38, 0)
      val qty = floor(col("l_quantity")).cast(LongType)
      val price = floor(col("l_extendedprice") * 100).cast(LongType)
      val disc = floor(col("l_discount") * 10000).cast(LongType)
      val tax = floor(col("l_tax") * 10000).cast(LongType)
      Tables.lineitem(spark, dir)
        .where(to_date(col("l_shipdate")) <= lit("1999-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(qty.cast(d38)).cast(LongType).as("sum_qty"),
          (sum(price.cast(d38)).cast(DoubleType) / 100.0).as("sum_base_price"),
          (sum((price * (lit(10000L) - disc)).cast(d38)).cast(DoubleType)
            / 1000000.0).as("sum_disc_price"),
          (sum((price * (lit(10000L) - disc)).cast(d38) * (lit(10000L) + tax)
            .cast(d38)).cast(DoubleType) / 10000000000.0).as("sum_charge"),
          (sum(qty.cast(d38)).cast(DoubleType) / count(lit(1))).as("avg_qty"),
          (sum(price.cast(d38)).cast(DoubleType) / count(lit(1)) / 100.0)
            .as("avg_price"),
          (sum(disc.cast(d38)).cast(DoubleType) / count(lit(1)) / 10000.0)
            .as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Time-to-convert percentiles: per user, seconds from FIRST click to
    // the first purchase AFTER it (exact integer seconds), then the
    // p25/p50/p75 of that distribution via percentile_disc — the
    // conversion-latency panel. Two tiny per-user aggregates; the
    // percentile runs on #users rows.
    "fn3_time_to_convert" -> { (spark, dir) =>
      val ev = Tables.events(spark, dir)
      val fc = ev.where(col("event_type") === "click")
        .groupBy("user_id").agg(min(col("ts")).as("cts"))
      val deltas = ev.where(col("event_type") === "purchase")
        .join(fc, Seq("user_id"))
        .where(col("ts") >= col("cts"))
        .groupBy("user_id")
        .agg(expr("min(ts - cts) div 1000000000").as("secs"))
      // Spark's percentile_disc returns DOUBLE while DuckDB returns the
      // ORDER BY input type (BIGINT). The selected order statistics are
      // integral seconds < 2^53, so the cast back to LONG is exact and
      // makes the written parquet column type match the oracle's.
      deltas.agg(
        count(lit(1)).as("n_converted"),
        expr("CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY secs) AS BIGINT)").as("p25"),
        expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY secs) AS BIGINT)").as("p50"),
        expr("CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY secs) AS BIGINT)").as("p75"))
    },

    // Kaplan-Meier life table for time-to-convert with right-censoring —
    // the survival-analysis view fn3's percentiles can't give: subjects
    // enter at their FIRST click; conversion = first purchase at/after
    // entry (day granularity); non-converters are administratively
    // censored at the study end (global max event time). Per observed
    // day: n_at_risk (reverse cumulative over the bounded day axis),
    // n_events, n_censored — all exact integers; the KM product itself
    // is a trivial client-side fold over these rows (a float product
    // has no bit-portable cross-engine form, the table does). Scale:
    // two per-user aggregates, then windows over ~study-length rows.
    "km1_life_table" -> { (spark, dir) =>
      val ev = Tables.events(spark, dir)
      val fc = ev.where(col("event_type") === "click")
        .groupBy("user_id").agg(min(col("ts")).as("cts"))
        .localCheckpoint(eager = true) // feeds conversions + subjects
      val fp = ev.where(col("event_type") === "purchase")
        .join(fc, Seq("user_id"))
        .where(col("ts") >= col("cts"))
        .groupBy("user_id").agg(min(col("ts")).as("pts"))
      val end = ev.agg(max(col("ts")).as("t_end"))
      val subj = fc.join(fp, Seq("user_id"), "left")
        .crossJoin(broadcast(end))
        .select(
          when(col("pts").isNotNull,
            expr("(pts - cts) div 86400000000000"))
            .otherwise(expr("(t_end - cts) div 86400000000000")).as("day"),
          when(col("pts").isNotNull, 1L).otherwise(0L).as("event"))
      val tbl = subj.groupBy("day")
        .agg(sum(col("event")).as("n_events"),
          sum(lit(1L) - col("event")).as("n_censored"))
      val w = Window.orderBy(col("day").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tbl.withColumn("n_at_risk",
          sum(col("n_events") + col("n_censored")).over(w))
        .select(col("day"), col("n_at_risk"), col("n_events"),
          col("n_censored"))
        .orderBy("day")
    },

    // Multi-touch attribution over conversion paths: each purchase
    // credits the user's clicks in the preceding 7 days under three
    // models — first-touch, last-touch, and linear — reported per
    // acquisition channel (props.k mod 5). All credit is EXACT integer
    // milli-cents: the linear split uses largest-remainder
    // apportionment (base = mc div n, the mc mod n remainder goes +1
    // to the n earliest touches), so each purchase's credit sums to
    // exactly its value under every model on every engine. Scale shape:
    // one user-keyed join bounded by the 7-day window, per-conversion
    // windows bounded by path length — nothing global.
    "at1_attribution" -> { (spark, dir) =>
      val ev = Tables.events(spark, dir)
      val touches = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          expr("ts div 1000000000").as("cts"),
          (get_json_object(col("props"), "$.k").cast(LongType) % 5)
            .as("channel"))
      val conv = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("c_user"),
          col("event_id").as("purchase_id"),
          expr("ts div 1000000000").as("pts"),
          (floor(col("value") * 100).cast(LongType) * 1000).as("mc"))
      val w = Window.partitionBy(col("purchase_id"))
        .orderBy(col("cts"), col("click_id"))
      val wn = Window.partitionBy(col("purchase_id"))
      conv.join(touches,
          col("user_id") === col("c_user") &&
            col("cts") <= col("pts") && col("cts") > col("pts") - 604800L)
        .withColumn("rk", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wn))
        .groupBy("channel")
        .agg(
          count(lit(1)).as("n_touches"),
          countDistinct(col("purchase_id")).as("n_conversions"),
          sum(when(col("rk") === 1, col("mc")).otherwise(0L))
            .as("first_touch_mc"),
          sum(when(col("rk") === col("n"), col("mc")).otherwise(0L))
            .as("last_touch_mc"),
          sum(expr("mc div n") +
            when(col("rk") <= col("mc") % col("n"), 1L).otherwise(0L))
            .as("linear_mc"))
        .orderBy("channel")
    },

    // EXACT Shapley-value attribution — the game-theoretic credit split
    // at1's positional models approximate. Channels are the four
    // non-purchase event types; a user's "journey" is the SET of
    // channels touched before their first purchase; the coalition value
    // v(S) = #converters whose journey ⊆ S. With k=4 the Shapley sum is
    // closed-form over 16 subsets, and every weight |S|!·(3−|S|)! is an
    // integer once scaled by 4!=24 — so phi24 is BIGINT-exact and phi is
    // ONE trailing division. Scale shape: one user-keyed aggregate
    // collapses the event stream to ≤16 journey-mask counts; the subset
    // lattice, v(S) table, and the marginal-contribution join are all
    // ≤16-row broadcast relations — O(2^k) never touches data size.
    "shap1_shapley_attribution" -> { (spark, dir) =>
      val ev = Tables.events(spark, dir)
      val fp = ev.where(col("event_type") === "purchase")
        .groupBy("user_id").agg(min(col("ts_sec")).as("conv_ts"))
      val bit = when(col("event_type") === "click", 1L)
        .when(col("event_type") === "view", 2L)
        .when(col("event_type") === "signup", 4L)
        .when(col("event_type") === "error", 8L).otherwise(0L)
      val bits = ev.join(fp, Seq("user_id"))
        .where(col("ts_sec") < col("conv_ts"))
        .select(col("user_id"), bit.as("b"))
        .groupBy("user_id").agg(expr("bit_or(b)").as("m"))
      val masks = fp.join(bits, Seq("user_id"), "left")
        .select(coalesce(col("m"), lit(0L)).as("m"))
        .groupBy("m").agg(count(lit(1)).as("cu"))
      val subs = spark.range(16).select(col("id").as("s"))
      val v = subs.join(broadcast(masks),
          col("m").bitwiseAND(col("s")) === col("m"), "left")
        .groupBy("s").agg(coalesce(sum(col("cu")), lit(0L)).as("v"))
        .localCheckpoint(eager = true) // 16 rows; joined twice below
      val ch = spark.sql(
        """SELECT * FROM VALUES ('click', 1L), ('view', 2L),
          |  ('signup', 4L), ('error', 8L) AS t(channel, bit)""".stripMargin)
      val pc = expr("(s & 1) + ((s div 2) & 1) + ((s div 4) & 1) + ((s div 8) & 1)")
      val w = when(pc === 0 || pc === 3, lit(6L)).otherwise(lit(2L))
      ch.join(subs, col("s").bitwiseAND(col("bit")) === 0)
        .join(v.select(col("s").as("s0"), col("v").as("v0")),
          col("s0") === col("s"))
        .join(v.select(col("s").as("s1"), col("v").as("v1")),
          col("s1") === col("s") + col("bit"))
        .groupBy("channel")
        .agg(sum(w * (col("v1") - col("v0"))).as("phi24"))
        .select(col("channel"), col("phi24"),
          (col("phi24").cast(DoubleType) / lit(24.0)).as("phi"))
        .orderBy("channel")
    },

    // Q4 shape: order-priority checking — orders with at least one LATE
    // line (shipped >90 days after the order date), counted per
    // priority. The EXISTS decorrelates to a left-semi join keyed on
    // orderkey; the fact side carries only the two date columns.
    "tq4_priority_check" -> { (spark, dir) =>
      val late = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_shipdate"))
      Tables.orders(spark, dir)
        .join(late,
          col("l_orderkey") === col("o_orderkey") &&
            to_date(col("l_shipdate")) > date_add(to_date(col("o_orderdate")), 90),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    },

    // Q6 shape: forecast-revenue change — one scan, one filter, one
    // global sum; the exact-integer product floor(price·100) ×
    // floor(discount·10000) keeps the single output bit-stable.
    "tq6_forecast_revenue" -> { (spark, dir) =>
      Tables.lineitem(spark, dir)
        .where(year(col("l_shipdate")) === 1999 &&
          col("l_discount") >= 0.03 && col("l_discount") <= 0.05 &&
          col("l_quantity") < 24)
        .agg((sum((floor(col("l_extendedprice") * 100).cast(LongType) *
          floor(col("l_discount") * 10000).cast(LongType))
          .cast(DecimalType(38, 0))).cast(DoubleType) / 1000000.0)
          .as("forecast_revenue"))
    },

    // Q8 shape: national market share — NATION_3 suppliers' slice of
    // PROMO-part revenue sold into EUROPE, per order year. The share is
    // a conditional-sum / sum ratio over one joined relation (numerator
    // and denominator in the SAME pass — never two scans), dims
    // broadcast, revenue in exact integer cents until one final double
    // division per year.
    "tq8_market_share" -> { (spark, dir) =>
      val eur = Tables.region(spark, dir).where(col("r_name") === "EUROPE")
        .select("r_regionkey")
      val natC = Tables.nation(spark, dir)
        .join(broadcast(eur), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cnk"))
      val c = Tables.customer(spark, dir)
        .join(broadcast(natC), col("c_nationkey") === col("cnk"))
        .select("c_custkey")
      val natS = Tables.nation(spark, dir)
        .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
      val s = Tables.supplier(spark, dir)
        .join(broadcast(natS), col("s_nationkey") === col("snk"))
        .select("s_suppkey", "supp_nation")
      val p = Tables.part(spark, dir).where(col("p_type") === "PROMO")
        .select("p_partkey")
      val o = Tables.orders(spark, dir)
        .select("o_orderkey", "o_custkey", "o_orderdate")
      Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_partkey", "l_suppkey",
          "l_extendedprice", "l_discount")
        .join(broadcast(p), col("p_partkey") === col("l_partkey"))
        .join(o, col("o_orderkey") === col("l_orderkey"))
        .join(c, col("c_custkey") === col("o_custkey"))
        .join(broadcast(s), col("s_suppkey") === col("l_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          (sum(when(col("supp_nation") === "NATION_3", revQ)
            .otherwise(lit(0).cast(DecimalType(38, 0)))).cast(DoubleType) /
            sum(revQ).cast(DoubleType)).as("mkt_share"))
        .orderBy("o_year")
    },

    // Q13 shape: customer order-count distribution. The filter lives in
    // the JOIN CONDITION of the outer join (not a WHERE — that would
    // turn it inner), and the aggregate of an aggregate is the
    // histogram. Zero-order customers survive with c_count = 0.
    "tq13_order_distribution" -> { (spark, dir) =>
      val c = Tables.customer(spark, dir).select("c_custkey")
      val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_orderpriority")
      c.join(o,
          col("o_custkey") === col("c_custkey") &&
            col("o_orderpriority") =!= "4-NOT SPECIFIED",
          "left")
        .groupBy("c_custkey")
        // count(col) counts non-null only: unmatched customers get 0
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // Q14 shape: promo revenue share for one month — two conditional
    // exact-integer sums, ONE double division at the end. part is a dim
    // (200 rows/sf0.001) and broadcasts into the month-filtered fact.
    "tq14_promo_revenue" -> { (spark, dir) =>
      val p = Tables.part(spark, dir).select("p_partkey", "p_type")
      Tables.lineitem(spark, dir)
        .where(col("l_shipdate") >= lit("1999-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1999-04-01").cast("timestamp"))
        .join(broadcast(p), col("p_partkey") === col("l_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", revQ).otherwise(lit(0).cast(DecimalType(38, 0))))
            .as("promo"),
          sum(revQ).as("total"))
        .select(
          ((lit(100.0) * col("promo").cast(DoubleType)) / col("total").cast(DoubleType))
            .as("promo_revenue_pct"))
    },

    // Q15 shape: the supplier(s) with MAX quarterly revenue — an
    // aggregate feeding a scalar-max selection back onto itself. The
    // max is a 1-row broadcast; the equality join on exact DECIMAL
    // revenue keeps ties (the spec's correctness trap) instead of
    // arbitrarily picking one.
    "tq15_top_supplier" -> { (spark, dir) =>
      val rev = Tables.lineitem(spark, dir)
        .where(col("l_shipdate") >= lit("1999-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1999-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(sum(revQ).as("r"))
      val mx = rev.agg(max(col("r")).as("mx"))
      rev.join(broadcast(mx), col("r") === col("mx"))
        .join(Tables.supplier(spark, dir), col("s_suppkey") === col("l_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          (col("r").cast(DoubleType) / 1000000.0).as("total_revenue"))
        .orderBy("s_suppkey")
    },

    // Q16 shape: supplier variety per part segment, minus an excluded
    // supplier list (NOT IN → broadcast anti join) — distinct-count
    // after exclusion. lineitem stands in for partsupp (the testdata
    // ships no partsupp table; l_partkey × l_suppkey carries the same
    // relationship).
    // Q2 shape: min-cost supplier — the correlated scalar-min subquery
    // (for each part, the European supplier matching the regional
    // minimum cost). The fixture has no partsupp, so — the tq16
    // convention — the (part, supplier) cost relation derives from
    // lineitem: supplycost := min observed line price in exact cents.
    // The correlated min decorrelates to one aggregate joined back on
    // partkey (ties kept, as in the spec); dims broadcast; the ps
    // aggregate is the only fact-wide stage. Completes the 22/22
    // TPC-H plan-shape set together with tq11/tq20.
    "tq2_min_cost_supplier" -> { (spark, dir) =>
      val ps = Tables.lineitem(spark, dir)
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(floor(col("l_extendedprice") * 100).cast(LongType))
          .as("cost_cents"))
      val eu = broadcast(Tables.supplier(spark, dir)
        .join(broadcast(Tables.nation(spark, dir)),
          col("n_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.region(spark, dir)
          .where(col("r_name") === "EUROPE")),
          col("r_regionkey") === col("n_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
          col("n_name")))
      val euPs = ps.join(eu, col("s_suppkey") === col("l_suppkey"))
        .localCheckpoint(eager = true) // feeds the min + the match
      val minCost = euPs.groupBy(col("l_partkey").as("mk"))
        .agg(min(col("cost_cents")).as("min_cents"))
      // <= keeps the slice non-empty at every fixture SF (sf0.001 has
      // no size-15 ECONOMY part at all)
      val slice = broadcast(Tables.part(spark, dir)
        .where(col("p_type") === "ECONOMY" && col("p_size") <= 15)
        .select(col("p_partkey"), col("p_name")))
      euPs
        .join(minCost, col("mk") === col("l_partkey") &&
          col("cost_cents") === col("min_cents"))
        .join(slice, col("p_partkey") === col("l_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_name"),
          (col("cost_cents").cast(DoubleType) / 100.0).as("supplycost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    },

    // Q11 shape: important stock — per-part value HAVING above a
    // FRACTION of the global total: the aggregate-vs-global-scalar
    // comparison stays an exact integer cross-multiply
    // (value·1000 > total, i.e. share > 0.1%), no float near the
    // filter. Value derives from lineitem for one nation's suppliers
    // (partsupp substitute); the 1-row total broadcasts.
    "tq11_important_stock" -> { (spark, dir) =>
      // region-scoped rather than Q11's single nation: the sf0.001
      // fixture has 10 suppliers and may have NONE in a given nation,
      // while every region is populated at all SFs
      val natSupp = broadcast(Tables.supplier(spark, dir)
        .join(broadcast(Tables.nation(spark, dir)),
          col("n_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.region(spark, dir)
          .where(col("r_name") === "EUROPE")),
          col("r_regionkey") === col("n_regionkey"))
        .select(col("s_suppkey")))
      val value = Tables.lineitem(spark, dir)
        .join(natSupp, col("s_suppkey") === col("l_suppkey"))
        .groupBy("l_partkey")
        .agg(sum(floor(col("l_extendedprice") * 100).cast(LongType))
          .as("value_cents"))
        .localCheckpoint(eager = true) // feeds total + filter
      val tot = broadcast(value.agg(sum(col("value_cents")).as("tot_cents")))
      value.crossJoin(tot)
        .where(col("value_cents") * 1000 > col("tot_cents"))
        .select(col("l_partkey").as("ps_partkey"),
          (col("value_cents").cast(DoubleType) / 100.0).as("value"))
        .orderBy(col("value").desc, col("ps_partkey"))
    },

    // Q20 shape: potential part promotion — the nested semi-join chain
    // (suppliers ⋉ (part,supp) pairs ⋉ name-sliced parts) with a
    // front-loading condition: 1995 shipments exceeded HALF the
    // all-time volume (the availqty>½·shipped analog without
    // partsupp), compared as exact integer qty·2 > total. Each hop is
    // a semi join on keys; nothing explodes.
    "tq20_excess_stock" -> { (spark, dir) =>
      val redParts = broadcast(Tables.part(spark, dir)
        .where(col("p_name").startsWith("red"))
        .select(col("p_partkey")))
      val qty = Tables.lineitem(spark, dir)
        .join(redParts, col("p_partkey") === col("l_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
          sum(floor(col("l_quantity")).cast(LongType)).as("q_total"),
          sum(when(year(to_date(col("l_shipdate"))) === 1995,
            floor(col("l_quantity")).cast(LongType)).otherwise(0L))
            .as("q_1995"))
        .where(col("q_1995") * 2 > col("q_total"))
        // the fixture has few suppliers, so a bare EXISTS saturates —
        // keep suppliers whose front-loaded-part count is STRICTLY
        // ABOVE the all-supplier average (exact integer cross-multiply
        // k·n > Σk), which stays selective and non-empty at every SF
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_excess_parts"))
        .localCheckpoint(eager = true) // feeds the mean + the cut
      val stats = broadcast(qty.agg(
        sum(col("n_excess_parts")).as("tot_k"),
        count(lit(1)).as("n_supp")))
      val cut = qty.crossJoin(stats)
        .where(col("n_excess_parts") * col("n_supp") > col("tot_k"))
        .select(col("l_suppkey"), col("n_excess_parts"))
      Tables.supplier(spark, dir)
        .join(cut, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(spark, dir)),
          col("n_nationkey") === col("s_nationkey"))
        .select(col("s_name"), col("n_name"), col("n_excess_parts"))
        .orderBy("s_name")
    },

    "tq16_supplier_variety" -> { (spark, dir) =>
      val sizes = Seq(1, 5, 10, 15, 20, 25, 30, 35)
      val p = Tables.part(spark, dir)
        .where(col("p_brand") =!= "Brand#1" && col("p_size").isin(sizes: _*))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val bad = Tables.supplier(spark, dir).where(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey")
        .join(broadcast(bad), col("s_suppkey") === col("l_suppkey"), "left_anti")
        .join(broadcast(p), col("p_partkey") === col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },

    // Q18 shape: large-volume orders — the HAVING-filtered aggregate IS
    // the driving relation (no second lineitem pass to re-derive the
    // qty the subquery already computed). l_quantity holds integer
    // values, so its double sum is exact and the >300 cut is safe.
    "tq18_large_orders" -> { (spark, dir) =>
      val qty = Tables.lineitem(spark, dir)
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("total_qty"))
        .where(col("total_qty") > 300.0)
      Tables.orders(spark, dir)
        .join(qty, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(spark, dir), col("c_custkey") === col("o_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // Q22 shape: positive-balance customers above the mean balance with
    // no recent orders. The "above average" comparison is the exact
    // integer cross-multiply cents·n > Σcents — no double division
    // anywhere near the filter — and "no recent orders" is an anti
    // join against the date-filtered orders.
    "tq22_idle_capital" -> { (spark, dir) =>
      val pos = Tables.customer(spark, dir).where(col("c_acctbal") > 0)
        .select(col("c_custkey"), col("c_nationkey"),
          round(col("c_acctbal") * 100).cast(LongType).as("cents"))
      val st = pos.agg(sum(col("cents")).as("tot"), count(lit(1)).as("n"))
      val recent = Tables.orders(spark, dir)
        .where(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
      pos.crossJoin(broadcast(st))
        .where(col("cents") * col("n") > col("tot"))
        .join(recent, col("o_custkey") === col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"),
          (sum(col("cents")).cast(DoubleType) / 100.0).as("totacctbal"))
        .orderBy("c_nationkey")
    },

    // Q3 shape: shipping priority — segment-filtered customers drive
    // orders; still-unshipped-at-cutoff lineitems aggregate per order;
    // the global top-10 by revenue plans as TakeOrderedAndProject
    // (per-partition heaps + driver merge), never a full sort.
    "tq3_shipping_priority" -> { (spark, dir) =>
      val cut = lit("1998-01-01").cast("timestamp")
      val c = Tables.customer(spark, dir)
        .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = Tables.orders(spark, dir)
        .where(col("o_orderdate") < cut)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val l = Tables.lineitem(spark, dir)
        .where(col("l_shipdate") > cut)
        .select(col("l_orderkey"), revQ.as("rq"))
      l.join(o, col("o_orderkey") === col("l_orderkey"))
        .join(c, col("c_custkey") === col("o_custkey"))
        .groupBy(col("l_orderkey"),
          to_date(col("o_orderdate")).as("odate"), col("o_orderpriority"))
        .agg((sum(col("rq")).cast(DoubleType) / 1000000.0).as("revenue"))
        .orderBy(col("revenue").desc, col("odate"), col("l_orderkey"))
        .limit(10)
    },

    // Q9 shape (adapted: no partsupp fixture — unit cost proxied by
    // p_retailprice): profit by supplier nation and order year. Part
    // LIKE-filter and supplier/nation broadcast onto the fact; the only
    // big-big shuffle is lineitem⋈orders on the order key. Profit stays
    // an exact scaled integer until the final /1e6.
    "tq9_product_profit" -> { (spark, dir) =>
      val p = Tables.part(spark, dir)
        .where(col("p_name").like("%gear%"))
        .select(col("p_partkey"),
          round(col("p_retailprice") * 100).cast(LongType).as("rp_cents"))
      val s = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      val n = Tables.nation(spark, dir).select("n_nationkey", "n_name")
      val o = Tables.orders(spark, dir)
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
      val l = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          revQ.as("rq"), col("l_quantity").cast(LongType).as("ql"))
      l.join(broadcast(p), col("p_partkey") === col("l_partkey"))
        .join(broadcast(s), col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(n), col("n_nationkey") === col("s_nationkey"))
        .join(o, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("n_name").as("nation"), col("o_year"))
        .agg((sum(col("rq") - col("ql") * col("rp_cents") * 10000L)
          .cast(DoubleType) / 1000000.0).as("profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // Q12 shape (adapted: no l_shipmode/commitdate — lateness = shipped
    // >60 days after the order date): late-shipment share per order
    // priority. One fact-fact join, conditional count_if aggregation
    // with map-side partials, and a share division written identically
    // on both engines.
    "tq12_late_lines" -> { (spark, dir) =>
      val o = Tables.orders(spark, dir)
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val l = Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
      o.join(l, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_lines"),
          expr("count_if(l_shipdate > o_orderdate + INTERVAL 60 DAYS)").as("n_late"))
        .select(col("o_orderpriority"), col("n_lines"), col("n_late"),
          (col("n_late").cast(DoubleType) / col("n_lines").cast(DoubleType))
            .as("late_share"))
        .orderBy("o_orderpriority")
    },

    // Q17 shape: revenue locked in small-quantity lines — the
    // decorrelated scalar subquery (per-part average quantity) joined
    // back onto the same brand-filtered fact slice. The half-average
    // comparison is exact integer algebra (2·q·n < Σq), so the cutoff
    // cannot drift between engines.
    "tq17_small_qty_revenue" -> { (spark, dir) =>
      val p = Tables.part(spark, dir)
        .where(col("p_brand").isin("Brand#11", "Brand#12", "Brand#13"))
        .select("p_partkey")
      val l = Tables.lineitem(spark, dir)
        .select(col("l_partkey"), col("l_quantity").cast(LongType).as("ql"),
          revQ.as("rq"))
        .join(broadcast(p), col("p_partkey") === col("l_partkey"))
      val avgq = l.groupBy("l_partkey")
        .agg(sum(col("ql")).as("sq"), count(lit(1)).as("nq"))
      l.join(avgq, Seq("l_partkey"))
        .where(col("ql") * 2L * col("nq") < col("sq"))
        .agg(
          count(lit(1)).as("n_small_lines"),
          (sum(col("rq")).cast(DoubleType) / 1000000.0).as("small_qty_revenue"))
    },

    // Q19 shape: the disjunctive brand/size/quantity OR-blocks — the
    // predicate Catalyst must keep as one post-join filter (plus a
    // derivable p_partkey IsNotNull pushdown) rather than exploding
    // into a union of three scans.
    "tq19_disjunctive_revenue" -> { (spark, dir) =>
      val p = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")
      val l = Tables.lineitem(spark, dir)
        .select(col("l_partkey"), col("l_quantity").cast(LongType).as("ql"),
          revQ.as("rq"))
      val cond =
        (col("p_brand") === "Brand#11" && col("p_size").between(1, 15) &&
          col("ql").between(1, 20)) ||
        (col("p_brand") === "Brand#12" && col("p_size").between(10, 30) &&
          col("ql").between(10, 30)) ||
        (col("p_brand") === "Brand#13" && col("p_size").between(20, 50) &&
          col("ql").between(20, 40))
      l.join(broadcast(p), col("p_partkey") === col("l_partkey"))
        .where(cond)
        .agg(
          count(lit(1)).as("n_lines"),
          (sum(col("rq")).cast(DoubleType) / 1000000.0).as("revenue"))
    },

    // Exact Mann–Whitney AUC of order price predicting fulfilled
    // status. U counts (pos, neg) pairs ordered correctly (ties worth
    // ½): group to one row per distinct score with pos/neg counts, then
    // a DISTRIBUTED prefix sum of negatives in score order (the
    // Packing.prefixSum two-pass — a naive SUM() OVER (ORDER BY score)
    // is a single-partition sort at corpus scale). Everything is exact
    // integers in DECIMAL accumulators until the one final division;
    // doubled-U (2·below + ties) keeps the ½-tie credit integral.
    "ml1_auc" -> { (spark, dir) =>
      val dec = DecimalType(38, 0)
      val scored = Tables.orders(spark, dir)
        .groupBy(round(col("o_totalprice") * 100).cast(LongType).as("c"))
        .agg(
          expr("count_if(o_orderstatus = 'F')").as("npos"),
          expr("count_if(o_orderstatus <> 'F')").as("nneg"))
      val cum = Packing.prefixSum(scored, Seq(col("c")), col("nneg"), "cumneg")
      cum.agg(
          sum(col("npos")).as("np"),
          sum(col("nneg")).as("nn"),
          sum(col("npos").cast(dec) *
            (lit(2) * (col("cumneg") - col("nneg")) + col("nneg")).cast(dec)).as("u2"))
        .select(
          col("np").as("n_pos"), col("nn").as("n_neg"),
          (col("u2").cast(DoubleType) /
            (lit(2.0) * col("np").cast(DoubleType) * col("nn").cast(DoubleType))).as("auc"))
    },

    // Decile lift table for the same score/label pair: decile
    // boundaries come from exact rank selection over the grouped-by-
    // score relation (the a12 integer-ceil formula on a DISTRIBUTED
    // prefix sum of counts — no global ntile sort over raw rows), then
    // the 9 thresholds broadcast back onto the grouped relation. Equal
    // scores always land in the same decile — a promise ntile cannot
    // make. Lift is an exact integer cross-product ratio with one
    // double division.
    "ml2_decile_lift" -> { (spark, dir) =>
      val g = Tables.orders(spark, dir)
        .groupBy(round(col("o_totalprice") * 100).cast(LongType).as("c"))
        .agg(count(lit(1)).as("m"), expr("count_if(o_orderstatus = 'F')").as("p"))
      // crank = inclusive cumulative row count in score order; n = total
      val ranked = Packing.prefixSum(g, Seq(col("c")), col("m"), "crank")
        .localCheckpoint(eager = true) // two consumers below
      val st = broadcast(ranked.agg(sum(col("m")).as("n_all"), sum(col("p")).as("pos_all")))
      // threshold t_d = value at sorted position ceil(d·n/10): the
      // smallest score whose cumulative count reaches the boundary
      val th = ranked.crossJoin(st)
        .select(col("c"), col("crank"),
          explode(sequence(lit(1L), lit(9L))).as("d"), col("n_all"))
        .where(col("crank") >= expr("(d * n_all + 9L) div 10L"))
        .groupBy("d").agg(min(col("c")).as("t"))
      ranked.crossJoin(broadcast(th))
        .groupBy("c")
        .agg(min(col("m")).as("m1"), min(col("p")).as("p1"),
          sum(when(col("t") < col("c"), 1L).otherwise(0L)).as("bucket"))
        .groupBy("bucket")
        .agg(sum(col("m1")).as("n"), sum(col("p1")).as("n_pos"))
        .crossJoin(st)
        .select(col("bucket"), col("n"), col("n_pos"),
          ((col("n_pos") * col("n_all")).cast(DoubleType) /
            (col("n") * col("pos_all")).cast(DoubleType)).as("lift"))
        .orderBy("bucket")
    },
  )

  val oracles: Map[String, String] = Map(
    "tq3_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(o_orderdate AS DATE) AS odate, o_orderpriority,
        |  CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)
        |    * (10000 - CAST(floor(l_discount * 10000) AS BIGINT))) AS DOUBLE)
        |    / 1000000.0 AS revenue
        |FROM lineitem
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, odate, l_orderkey LIMIT 10""".stripMargin,
    "tq9_product_profit" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)
        |      * (10000 - CAST(floor(l_discount * 10000) AS BIGINT))
        |    - CAST(l_quantity AS BIGINT)
        |      * CAST(round(p_retailprice * 100) AS BIGINT) * 10000) AS DOUBLE)
        |    / 1000000.0 AS profit
        |FROM lineitem
        |  JOIN part ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON n_nationkey = s_nationkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "tq12_late_lines" ->
      """WITH j AS (
        |  SELECT o_orderpriority, COUNT(*) AS n_lines,
        |    count_if(l_shipdate > o_orderdate + INTERVAL 60 DAY) AS n_late
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |  GROUP BY 1)
        |SELECT o_orderpriority, n_lines, CAST(n_late AS BIGINT) AS n_late,
        |  CAST(n_late AS DOUBLE) / CAST(n_lines AS DOUBLE) AS late_share
        |FROM j ORDER BY o_orderpriority""".stripMargin,
    "tq17_small_qty_revenue" ->
      """WITH l AS (
        |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS ql,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT)
        |      * (10000 - CAST(floor(l_discount * 10000) AS BIGINT)) AS rq
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_brand IN ('Brand#11', 'Brand#12', 'Brand#13')
        |), a AS (
        |  SELECT l_partkey, CAST(SUM(ql) AS BIGINT) AS sq, COUNT(*) AS nq
        |  FROM l GROUP BY 1)
        |SELECT COUNT(*) AS n_small_lines,
        |  CAST(SUM(rq) AS DOUBLE) / 1000000.0 AS small_qty_revenue
        |FROM l JOIN a USING (l_partkey)
        |WHERE ql * 2 * nq < sq""".stripMargin,
    "tq19_disjunctive_revenue" ->
      """WITH l AS (
        |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS ql,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT)
        |      * (10000 - CAST(floor(l_discount * 10000) AS BIGINT)) AS rq
        |  FROM lineitem)
        |SELECT COUNT(*) AS n_lines,
        |  CAST(SUM(rq) AS DOUBLE) / 1000000.0 AS revenue
        |FROM l JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
        |        AND ql BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 30
        |        AND ql BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 50
        |        AND ql BETWEEN 20 AND 40)""".stripMargin,
    "tq1_pricing_summary" ->
      """WITH q AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(floor(l_quantity) AS BIGINT) AS qty,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS price,
        |    CAST(floor(l_discount * 10000) AS BIGINT) AS disc,
        |    CAST(floor(l_tax * 10000) AS BIGINT) AS tax
        |  FROM lineitem
        |  WHERE CAST(l_shipdate AS DATE) <= DATE '1999-09-02'
        |)
        |SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(qty) AS BIGINT) AS sum_qty,
        |  CAST(SUM(price) AS DOUBLE) / 100.0 AS sum_base_price,
        |  CAST(SUM(price * (10000 - disc)) AS DOUBLE) / 1000000.0
        |    AS sum_disc_price,
        |  CAST(SUM(CAST(price * (10000 - disc) AS HUGEINT) * (10000 + tax))
        |    AS DOUBLE) / 10000000000.0 AS sum_charge,
        |  CAST(SUM(qty) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(price) AS DOUBLE) / COUNT(*) / 100.0 AS avg_price,
        |  CAST(SUM(disc) AS DOUBLE) / COUNT(*) / 10000.0 AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM q GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "fn3_time_to_convert" ->
      """WITH fc AS (
        |  SELECT user_id, min(epoch_ns(ts)) AS cts
        |  FROM events WHERE event_type = 'click' GROUP BY 1
        |), deltas AS (
        |  SELECT p.user_id,
        |    min(epoch_ns(p.ts) - fc.cts) // 1000000000 AS secs
        |  FROM events p JOIN fc USING (user_id)
        |  WHERE p.event_type = 'purchase' AND epoch_ns(p.ts) >= fc.cts
        |  GROUP BY 1
        |)
        |SELECT COUNT(*) AS n_converted,
        |  percentile_disc(0.25) WITHIN GROUP (ORDER BY secs) AS p25,
        |  percentile_disc(0.5) WITHIN GROUP (ORDER BY secs) AS p50,
        |  percentile_disc(0.75) WITHIN GROUP (ORDER BY secs) AS p75
        |FROM deltas""".stripMargin,
    "km1_life_table" ->
      """WITH fc AS (
        |  SELECT user_id, min(epoch_ns(ts)) AS cts
        |  FROM events WHERE event_type = 'click' GROUP BY 1
        |), fp AS (
        |  SELECT p.user_id, min(epoch_ns(p.ts)) AS pts
        |  FROM events p JOIN fc USING (user_id)
        |  WHERE p.event_type = 'purchase' AND epoch_ns(p.ts) >= fc.cts
        |  GROUP BY 1
        |), t_end AS (
        |  SELECT max(epoch_ns(ts)) AS te FROM events
        |), subj AS (
        |  SELECT CASE WHEN fp.pts IS NOT NULL
        |      THEN (fp.pts - fc.cts) // 86400000000000
        |      ELSE (t_end.te - fc.cts) // 86400000000000 END AS day,
        |    CASE WHEN fp.pts IS NOT NULL THEN 1 ELSE 0 END AS event
        |  FROM fc LEFT JOIN fp USING (user_id), t_end
        |), tbl AS (
        |  SELECT day, CAST(SUM(event) AS BIGINT) AS n_events,
        |    CAST(SUM(1 - event) AS BIGINT) AS n_censored
        |  FROM subj GROUP BY 1
        |)
        |SELECT day, CAST(SUM(n_events + n_censored) OVER (ORDER BY day DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_at_risk,
        |  n_events, n_censored
        |FROM tbl ORDER BY day""".stripMargin,
    "at1_attribution" ->
      """WITH t AS (
        |  SELECT user_id, event_id AS click_id,
        |    epoch_ns(ts) // 1000000000 AS cts,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) % 5 AS channel
        |  FROM events WHERE event_type = 'click'
        |), c AS (
        |  SELECT user_id, event_id AS purchase_id,
        |    epoch_ns(ts) // 1000000000 AS pts,
        |    CAST(floor(value * 100) AS BIGINT) * 1000 AS mc
        |  FROM events WHERE event_type = 'purchase'
        |), cand AS (
        |  SELECT c.purchase_id, c.mc, t.click_id, t.cts, t.channel
        |  FROM c JOIN t USING (user_id)
        |  WHERE t.cts <= c.pts AND t.cts > c.pts - 604800
        |), rk AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY purchase_id
        |      ORDER BY cts, click_id) AS rk,
        |    COUNT(*) OVER (PARTITION BY purchase_id) AS n
        |  FROM cand
        |)
        |SELECT channel, COUNT(*) AS n_touches,
        |  CAST(COUNT(DISTINCT purchase_id) AS BIGINT) AS n_conversions,
        |  CAST(SUM(CASE WHEN rk = 1 THEN mc ELSE 0 END) AS BIGINT)
        |    AS first_touch_mc,
        |  CAST(SUM(CASE WHEN rk = n THEN mc ELSE 0 END) AS BIGINT)
        |    AS last_touch_mc,
        |  CAST(SUM(mc // n + CASE WHEN rk <= mc % n THEN 1 ELSE 0 END)
        |    AS BIGINT) AS linear_mc
        |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin,
    // journeys as 4-bit channel masks; v(S) over the 16-subset lattice;
    // Shapley weights scaled by 4!=24 so phi24 is integer-exact
    "shap1_shapley_attribution" ->
      """WITH fp AS (
        |  SELECT user_id, MIN(date_trunc('second', ts)) AS conv_ts
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1
        |), bits AS (
        |  SELECT e.user_id,
        |    CAST(bit_or(CASE e.event_type WHEN 'click' THEN 1
        |      WHEN 'view' THEN 2 WHEN 'signup' THEN 4
        |      WHEN 'error' THEN 8 ELSE 0 END) AS BIGINT) AS m
        |  FROM events e JOIN fp ON e.user_id = fp.user_id
        |    AND date_trunc('second', e.ts) < fp.conv_ts
        |  GROUP BY 1
        |), masks AS (
        |  SELECT COALESCE(b.m, 0) AS m, COUNT(*) AS cu
        |  FROM fp LEFT JOIN bits b ON fp.user_id = b.user_id GROUP BY 1
        |), subs AS (
        |  SELECT CAST(g.s AS BIGINT) AS s
        |  FROM UNNEST(generate_series(0, 15)) AS g(s)
        |), v AS (
        |  SELECT subs.s, CAST(COALESCE(SUM(m.cu), 0) AS BIGINT) AS v
        |  FROM subs LEFT JOIN masks m ON (m.m & subs.s) = m.m GROUP BY 1
        |), ch AS (
        |  SELECT channel, CAST(bit AS BIGINT) AS bit FROM (VALUES
        |    ('click', 1), ('view', 2), ('signup', 4), ('error', 8))
        |    AS t(channel, bit)
        |), marg AS (
        |  SELECT ch.channel,
        |    CASE WHEN (subs.s & 1) + ((subs.s // 2) & 1)
        |        + ((subs.s // 4) & 1) + ((subs.s // 8) & 1) IN (0, 3)
        |      THEN 6 ELSE 2 END AS w,
        |    v1.v - v0.v AS d
        |  FROM ch JOIN subs ON (subs.s & ch.bit) = 0
        |  JOIN v v0 ON v0.s = subs.s
        |  JOIN v v1 ON v1.s = subs.s + ch.bit
        |)
        |SELECT channel, CAST(SUM(w * d) AS BIGINT) AS phi24,
        |  CAST(CAST(SUM(w * d) AS BIGINT) AS DOUBLE) / 24.0 AS phi
        |FROM marg GROUP BY 1 ORDER BY 1""".stripMargin,
    "tq4_priority_check" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders o
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE)
        |        + INTERVAL 90 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "tq6_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)
        |  * CAST(floor(l_discount * 10000) AS BIGINT)) AS DOUBLE) / 1000000.0
        |  AS forecast_revenue
        |FROM lineitem
        |WHERE year(l_shipdate) = 1999
        |  AND l_discount >= 0.03 AND l_discount <= 0.05
        |  AND l_quantity < 24""".stripMargin,
    "tq8_market_share" ->
      """WITH base AS (
        |  SELECT year(o_orderdate) AS o_year,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT)
        |      * (10000 - CAST(floor(l_discount * 10000) AS BIGINT)) AS rev,
        |    ns.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON p_partkey = l_partkey AND p_type = 'PROMO'
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation nc ON nc.n_nationkey = c_nationkey
        |  JOIN region ON r_regionkey = nc.n_regionkey AND r_name = 'EUROPE'
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ns ON ns.n_nationkey = s_nationkey
        |)
        |SELECT o_year,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE 0 END)
        |       AS DOUBLE) / CAST(SUM(rev) AS DOUBLE) AS mkt_share
        |FROM base GROUP BY 1 ORDER BY 1""".stripMargin,
    "tq7_cross_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)
        |    * (10000 - CAST(floor(l_discount * 10000) AS BIGINT))) AS DOUBLE)
        |    / 1000000.0 AS revenue
        |FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation n1 ON n1.n_nationkey = s_nationkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n2 ON n2.n_nationkey = c_nationkey
        |WHERE n1.n_name IN ('NATION_3', 'NATION_8', 'NATION_12')
        |  AND n2.n_name IN ('NATION_3', 'NATION_8', 'NATION_12')
        |  AND n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "tq13_order_distribution" ->
      """WITH c_orders AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON o_custkey = c_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY c_custkey)
        |SELECT c_count, count(*) AS custdist
        |FROM c_orders GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "tq14_promo_revenue" ->
      """WITH t AS (
        |  SELECT
        |    SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(floor(l_extendedprice * 100) AS BIGINT)
        |        * (10000 - CAST(floor(l_discount * 10000) AS BIGINT))
        |      ELSE 0 END) AS promo,
        |    SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)
        |      * (10000 - CAST(floor(l_discount * 10000) AS BIGINT))) AS total
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1999-03-01'
        |    AND l_shipdate < TIMESTAMP '1999-04-01')
        |SELECT (100.0 * CAST(promo AS DOUBLE)) / CAST(total AS DOUBLE)
        |  AS promo_revenue_pct
        |FROM t""".stripMargin,
    "tq15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)
        |      * (10000 - CAST(floor(l_discount * 10000) AS BIGINT))) AS r
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1999-01-01'
        |    AND l_shipdate < TIMESTAMP '1999-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(r AS DOUBLE) / 1000000.0 AS total_revenue
        |FROM rev JOIN supplier ON s_suppkey = l_suppkey
        |WHERE r = (SELECT max(r) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "tq2_min_cost_supplier" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    MIN(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS cost_cents
        |  FROM lineitem GROUP BY 1, 2
        |), eu AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier
        |  JOIN nation ON n_nationkey = s_nationkey
        |  JOIN region ON r_regionkey = n_regionkey
        |  WHERE r_name = 'EUROPE'
        |), eups AS (
        |  SELECT ps.l_partkey, ps.cost_cents, eu.s_name, eu.s_acctbal,
        |    eu.n_name
        |  FROM ps JOIN eu ON eu.s_suppkey = ps.l_suppkey
        |), mc AS (
        |  SELECT l_partkey, MIN(cost_cents) AS min_cents
        |  FROM eups GROUP BY 1
        |)
        |SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_name,
        |  CAST(e.cost_cents AS DOUBLE) / 100.0 AS supplycost
        |FROM eups e
        |JOIN mc ON mc.l_partkey = e.l_partkey
        |  AND e.cost_cents = mc.min_cents
        |JOIN part p ON p.p_partkey = e.l_partkey
        |WHERE p.p_type = 'ECONOMY' AND p.p_size <= 15
        |ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
        |LIMIT 100""".stripMargin,
    "tq11_important_stock" ->
      """WITH v AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS value_cents
        |  FROM lineitem
        |  WHERE l_suppkey IN (
        |    SELECT s_suppkey FROM supplier
        |    JOIN nation ON n_nationkey = s_nationkey
        |    JOIN region ON r_regionkey = n_regionkey
        |    WHERE r_name = 'EUROPE')
        |  GROUP BY 1
        |), t AS (SELECT CAST(SUM(value_cents) AS BIGINT) AS tot FROM v)
        |SELECT l_partkey AS ps_partkey,
        |  CAST(value_cents AS DOUBLE) / 100.0 AS value
        |FROM v, t
        |WHERE value_cents * 1000 > tot
        |ORDER BY value DESC, ps_partkey""".stripMargin,
    "tq20_excess_stock" ->
      """WITH q AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
        |      AS q_total,
        |    CAST(SUM(CASE WHEN year(CAST(l_shipdate AS DATE)) = 1995
        |      THEN CAST(floor(l_quantity) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS q_1995
        |  FROM lineitem
        |  WHERE l_partkey IN
        |    (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |  GROUP BY 1, 2
        |), ex AS (
        |  SELECT l_suppkey, COUNT(*) AS n_excess_parts
        |  FROM q WHERE q_1995 * 2 > q_total
        |  GROUP BY 1
        |), st AS (
        |  SELECT CAST(SUM(n_excess_parts) AS BIGINT) AS tot_k,
        |    COUNT(*) AS n_supp
        |  FROM ex
        |)
        |SELECT s_name, n_name, n_excess_parts
        |FROM supplier
        |JOIN ex ON l_suppkey = s_suppkey
        |JOIN nation ON n_nationkey = s_nationkey, st
        |WHERE n_excess_parts * n_supp > tot_k
        |ORDER BY s_name""".stripMargin,
    "tq16_supplier_variety" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "tq18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(l_quantity) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  total_qty
        |FROM big JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "tq22_idle_capital" ->
      """WITH pos AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer WHERE c_acctbal > 0),
        |st AS (SELECT sum(cents) AS tot, count(*) AS n FROM pos)
        |SELECT c_nationkey, count(*) AS numcust,
        |  CAST(sum(cents) AS DOUBLE) / 100.0 AS totacctbal
        |FROM pos, st
        |WHERE cents * n > tot
        |  AND c_custkey NOT IN (
        |    SELECT o_custkey FROM orders
        |    WHERE o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ml1_auc" ->
      """WITH s AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c,
        |    count(*) FILTER (WHERE o_orderstatus = 'F') AS npos,
        |    count(*) FILTER (WHERE o_orderstatus <> 'F') AS nneg
        |  FROM orders GROUP BY 1),
        |p AS (
        |  SELECT npos, nneg,
        |    coalesce(sum(nneg) OVER (ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
        |  FROM s)
        |SELECT CAST(sum(npos) AS BIGINT) AS n_pos,
        |  CAST(sum(nneg) AS BIGINT) AS n_neg,
        |  CAST(sum(npos * (2 * below + nneg)) AS DOUBLE)
        |    / (2.0 * CAST(sum(npos) AS DOUBLE) * CAST(sum(nneg) AS DOUBLE))
        |    AS auc
        |FROM p""".stripMargin,
    "ml2_decile_lift" ->
      """WITH g AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c,
        |    count(*) AS m,
        |    count(*) FILTER (WHERE o_orderstatus = 'F') AS p
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT c, m, p,
        |    sum(m) OVER (ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS crank,
        |    sum(m) OVER () AS n_all
        |  FROM g),
        |th AS (
        |  SELECT d, min(c) AS t
        |  FROM r, (SELECT unnest(range(1, 10)) AS d)
        |  WHERE crank >= (d * n_all + 9) // 10
        |  GROUP BY d),
        |st AS (SELECT sum(m) AS n_all, sum(p) AS pos_all FROM g),
        |b AS (
        |  SELECT r.c, min(r.m) AS m1, min(r.p) AS p1,
        |    CAST(sum(CASE WHEN th.t < r.c THEN 1 ELSE 0 END) AS BIGINT)
        |      AS bucket
        |  FROM r CROSS JOIN th GROUP BY r.c)
        |SELECT bucket, CAST(sum(m1) AS BIGINT) AS n,
        |  CAST(sum(p1) AS BIGINT) AS n_pos,
        |  CAST(sum(p1) * (SELECT n_all FROM st) AS DOUBLE)
        |    / CAST(sum(m1) * (SELECT pos_all FROM st) AS DOUBLE) AS lift
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
  )
}
