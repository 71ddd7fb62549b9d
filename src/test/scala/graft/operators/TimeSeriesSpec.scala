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
}
