package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** st22 (full-outer stream-stream join): fixture-level agreement with
  * the batch replay, plus PLANTED boundary data pinning both emission
  * rules the DuckDB oracle encodes — especially the purchase at exactly
  * the global watermark, which must stay PENDING (strict `<`), not emit.
  */
class StreamFullJoinSpec extends SparkSpec {

  /** Write a planted events.parquet into a fresh dir (the file-stream
    * source layout EventsStream expects) and run the full-outer join.
    * Rows: (event_id, epochSec, user_id, event_type).
    */
  private def runPlanted(rows: Seq[(Long, Long, Long, String)]) = {
    import spark.implicits._
    val dir = graft.tools.Scratch.dir("st22").toString
    // the file-stream source globs for a FILE named events.parquet (the
    // fixture layout) — write to a scratch dir and move the part file
    rows.toDF("event_id", "epoch_s", "user_id", "event_type")
      .select(col("event_id"),
        timestamp_seconds(col("epoch_s")).as("ts"),
        col("user_id"), col("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/scratch")
    val part = new java.io.File(s"$dir/scratch").listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    EventsStream.streamStreamFullJoin(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
  }

  test("planted: unmatched purchase emits only STRICTLY below the watermark") {
    // user 1: purchase at 100 with no click — watermark ends at
    // min(max cts, max pts) = min(10000, 10000) = 10000, so it emits
    // null-extended. user 2: purchase at exactly the watermark (10000)
    // with no matching click — must stay pending (NOT emitted).
    // users 9 (clicks) / 8 (purchases) pin the watermark at 10000.
    val got = runPlanted(Seq(
      (1L, 100L, 1L, "purchase"),
      (2L, 10000L, 2L, "purchase"),
      (3L, 10000L, 9L, "click"),
      (4L, 10000L, 8L, "purchase"),
    ))
    // (n_rows, n_unmatched_clicks, n_unmatched_purchases, n_matched)
    assert(got.get(1L).contains((1L, 0L, 1L, 0L)),
      s"purchase below watermark must emit unmatched: $got")
    assert(!got.contains(2L),
      s"purchase AT the watermark must stay pending: $got")
  }

  test("planted: click unmatched at click_ts+1h < wm; exact-boundary click pends") {
    // user 1: click at 100, no purchase: 100+3600 < 10000 → emits.
    // user 2: click at 6400: 6400+3600 = 10000 is NOT < 10000 → pends.
    // user 3: click at 500 and purchase at 4100 = 500+3600 (inclusive
    // range bound) → matched pair emits in the data batch.
    val got = runPlanted(Seq(
      (1L, 100L, 1L, "click"),
      (2L, 6400L, 2L, "click"),
      (3L, 500L, 3L, "click"),
      (4L, 4100L, 3L, "purchase"),
      (5L, 10000L, 9L, "click"),
      (6L, 10000L, 8L, "purchase"),
    ))
    assert(got.get(1L).contains((1L, 1L, 0L, 0L)),
      s"sealed click must emit unmatched: $got")
    assert(!got.contains(2L), s"boundary click must stay pending: $got")
    assert(got.get(3L).contains((1L, 0L, 0L, 1L)),
      s"inclusive +1h match must pair: $got")
  }

  test("fixture: streamed full outer equals the batch watermark replay") {
    val streamed = EventsStream.streamStreamFullJoin(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

    val ev = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"),
        col("ts_sec").cast("long").as("sec"), col("event_type"))
    import spark.implicits._
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("sec").as("cts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("sec").as("pts"))
    val wm = math.min(
      clicks.agg(max("cts")).head.getLong(0),
      purchases.agg(max("pts")).head.getLong(0))
    val m = clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("pts") >= col("cts") && col("pts") <= col("cts") + 3600)
      .select(col("user_id"), col("click_id"), col("purchase_id"))
    val u = clicks.where(col("cts") + 3600 < wm)
      .join(m.select(col("click_id")), Seq("click_id"), "left_anti")
      .select(col("user_id"), col("click_id"), lit(null).cast("long").as("purchase_id"))
    val v = purchases.where(col("pts") < wm)
      .join(m.select(col("purchase_id")), Seq("purchase_id"), "left_anti")
      .select(col("p_user_id").as("user_id"),
        lit(null).cast("long").as("click_id"), col("purchase_id"))
    val batch = m.unionByName(u).unionByName(v)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_rows"),
        expr("count_if(purchase_id IS NULL)").as("n_unmatched_clicks"),
        expr("count_if(click_id IS NULL)").as("n_unmatched_purchases"),
        countDistinct(when(col("click_id").isNotNull, col("purchase_id")))
          .as("n_purchases_matched"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
