package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit semantics for the time-series regularization operators on a tiny
  * hand-computable series (the cross-engine gate runs via ts1/ts2/w5).
  */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  // One user, observations at hours 0, 1 and 4 (hours 2, 3 are holes);
  // a second user with a single observation (degenerate spine).
  private def ev = Seq(
    (100L, 1L, "2024-01-01 00:10:00", 10.0),
    (101L, 1L, "2024-01-01 00:50:00", 20.0), // hour 0 sums to 30
    (102L, 1L, "2024-01-01 01:30:00", 6.0),
    (103L, 1L, "2024-01-01 04:30:00", 42.0),
    (104L, 2L, "2024-03-05 12:00:00", 7.0),
  ).toDF("event_id", "user_id", "s", "value")
    .select(col("event_id"), col("user_id"),
      to_timestamp(col("s")).as("ts_sec"), col("value"))

  test("gapFillForward: holes carry the last observed hourly sum") {
    val out = TimeSeries.gapFillForward(ev)
      .orderBy("user_id", "hr")
      .select("user_id", "n_events", "v_fill")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq(
      (1L, 2L, 30.0), // hour 0: two events
      (1L, 1L, 6.0),  // hour 1
      (1L, 0L, 6.0),  // hole: forward-filled
      (1L, 0L, 6.0),  // hole: forward-filled
      (1L, 1L, 42.0), // hour 4
      (2L, 1L, 7.0),  // single-hour spine
    ))
  }

  test("interpolateLinear: holes interpolate linearly, actuals unchanged") {
    val out = TimeSeries.interpolateLinear(ev)
      .where(col("user_id") === 1L)
      .orderBy("hr")
      .select("is_actual", "v_interp")
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
    // hours 1 → 4 run 6.0 → 42.0, so holes at 2, 3 are 18.0, 30.0
    assert(out.toSeq === Seq(
      (1, 30.0), (1, 6.0), (0, 18.0), (0, 30.0), (1, 42.0)))
  }

  test("property: random sparse series — dense spine, LOCF and bounded interpolation") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 3) {
      // ~3 users, observations scattered over ~200 hours with big holes
      val rows = (0 until 80).map { i =>
        val user = 1L + rnd.nextInt(3)
        val hour = rnd.nextInt(200)
        val minute = rnd.nextInt(60)
        (i.toLong + trial * 1000, user,
          f"2024-02-0${1 + hour / 24}%s ${hour % 24}%02d:$minute%02d:00",
          rnd.nextDouble() * 100)
      }
      val events = rows.toDF("event_id", "user_id", "s", "value")
        .select(col("event_id"), col("user_id"),
          to_timestamp(col("s")).as("ts_sec"), col("value"))

      val filled = TimeSeries.gapFillForward(events)
        .orderBy("user_id", "hr").collect()
      val interp = TimeSeries.interpolateLinear(events)
        .orderBy("user_id", "hr").collect()
      assert(filled.length === interp.length)

      val byUser = filled.groupBy(_.getLong(0))
      for ((_, rs) <- byUser) {
        // spine is dense: consecutive hours, no gaps or duplicates
        val hrs = rs.map(_.getTimestamp(1).getTime)
        assert(hrs.sliding(2).forall {
          case Array(a, b) => b - a == 3600000L
          case _ => true
        }, "spine not hourly-dense")
        // LOCF: v_fill never null (first spine hour is an observation)
        assert(rs.forall(!_.isNullAt(3)), "v_fill null after first observation")
      }
      // interpolated values are bounded by the surrounding observations'
      // global range (linear interpolation can't extrapolate)
      val actuals = interp.filter(_.getInt(2) == 1).map(_.getDouble(3))
      val (lo, hi) = (actuals.min, actuals.max)
      assert(interp.forall { r =>
        val v = r.getDouble(3); v >= lo - 1e-9 && v <= hi + 1e-9
      }, "interpolation escaped the observed range")
    }
  }

  test("trailingWindow: RANGE frame spans exactly the trailing hour") {
    val out = TimeSeries.trailingWindow(ev, 3600L)
      .where(col("user_id") === 1L)
      .orderBy("es")
      .select("mv_n", "mv_sum")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // 00:10 → {10}; 00:50 → {10,20}; 01:30 → {20,6} (00:10 is 4800s back,
    // 00:50 is 2400s back); 04:30 → {42} alone.
    assert(out.toSeq === Seq(
      (1L, 10.0), (2L, 30.0), (2L, 26.0), (1L, 42.0)))
  }

  test("iqrOutliers: flags only values beyond the IQR fences") {
    // 20 values clustered at 10.0 +- small, one extreme spike, one dip.
    val rows = (1L to 20L).map(i => (i, 1L, "2024-01-01 00:00:00", 10.0 + i * 0.01)) ++
      Seq((21L, 1L, "2024-01-01 01:00:00", 500.0), // spike
          (22L, 1L, "2024-01-01 02:00:00", -400.0)) // dip
    val df = rows.toDF("event_id", "user_id", "s", "value")
      .select(col("event_id"), lit("tick").as("event_type"),
        to_timestamp(col("s")).as("ts_sec"), col("value"))
    val out = TimeSeries.iqrOutliers(df).orderBy("event_id")
      .select("event_id").collect().map(_.getLong(0))
    assert(out.toSeq === Seq(21L, 22L))
  }

  test("ewmaExact matches the brute-force weighted sum, newest weighted highest") {
    // One user, 20 events, value = event_id (so q = id * 2^20 exactly).
    val df = (1L to 20L).map(i =>
      (i, 7L, f"2024-01-01 00:${i}%02d:00", i.toDouble))
      .toDF("event_id", "user_id", "s", "value")
      .select(col("event_id"), col("user_id"),
        to_timestamp(col("s")).as("ts_sec"), col("value"))
    val got = TimeSeries.ewmaExact(df, span = 16)
      .orderBy("event_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length === 20)
    val q = (1L to 20L).map(_ * 1048576L)
    for ((row, idx) <- got.zipWithIndex) {
      val t = idx + 1 // 1-based position
      val lo = math.max(1, t - 15)
      val num = (lo to t).map(i => q(i.toInt - 1) * (1L << (15 - (t - i)))).sum
      val den = (lo to t).map(i => 1L << (15 - (t - i))).sum
      assert((row._2, row._3) === (num, den), s"row $t")
    }
    // newest observation dominates: EWMA at t=20 sits between x19 and x20
    val (n20, d20) = (got.last._2.toDouble, got.last._3.toDouble)
    val ewma = n20 / d20 / 1048576.0
    assert(ewma > 19.0 && ewma < 20.0)
  }
}
