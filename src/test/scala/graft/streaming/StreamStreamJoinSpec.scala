package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class StreamStreamJoinSpec extends SparkSpec {

  test("stream-stream join emits exactly the batch time-range join") {
    val streamed = EventsStream.streamStreamJoin(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

    val ev = Tables.events(spark, sf0001)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts_sec").as("click_ts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts_sec").as("purchase_ts"))
    val batch = clicks.join(
      purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_pairs"),
        countDistinct(col("click_id")).as("n_clicks_matched"),
        countDistinct(col("purchase_id")).as("n_purchases_matched"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

    assert(streamed == batch,
      s"stream(${streamed.size} users) != batch(${batch.size} users)")
    assert(batch.nonEmpty, "fixture must produce at least one joined pair")
  }
}
