package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

/** transformWithState (state v2): named ValueStates must accumulate
  * ACROSS micro-batches, and the processor requires the RocksDB store.
  */
class StateV2Spec extends SparkSpec {
  import spark.implicits._

  test("per-user totals accumulate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[StateV2.EvIn]
      val totals = input.toDS()
        .groupByKey(_.user_id)
        .transformWithState(
          new StateV2.TotalsProcessor, TimeMode.None(), OutputMode.Update(),
          Encoders.product[StateV2.UserTotals])
      val q = totals.writeStream
        .outputMode(OutputMode.Update())
        .format("memory")
        .queryName("tws_totals")
        .start()
      try {
        input.addData(
          StateV2.EvIn(1L, 1000000000L, 1.5, 1L),
          StateV2.EvIn(1L, 2000000000L, 2.25, 2L),
          StateV2.EvIn(2L, 3000000000L, -0.5, 3L))
        q.processAllAvailable()
        input.addData( // batch 2: user 1 keeps counting from state
          StateV2.EvIn(1L, 5000000000L, 10.0, 4L))
        q.processAllAvailable()
      } finally q.stop()
      // Update-mode memory sink keeps one emission per (batch, user);
      // the LAST emission per user is the final state snapshot.
      val last = spark.table("tws_totals")
        .groupBy("user_id")
        .agg(org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.struct("n_events", "sum_v4", "last_event_ms")).as("s"))
        .select("user_id", "s.n_events", "s.sum_v4", "s.last_event_ms")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      // floor(1.5e4)+floor(2.25e4)+floor(10e4) = 15000+22500+100000
      assert(last(1L) === ((3L, 137500L, 5000L)))
      assert(last(2L) === ((1L, -5000L, 3000L))) // floor(-0.5*1e4) = -5000; 3e9 ns = 3000 ms
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
