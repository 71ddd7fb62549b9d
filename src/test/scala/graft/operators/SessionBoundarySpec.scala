package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins Spark's `session_window` exact-gap boundary semantics with
  * planted data, so the st6/st18 DuckDB oracles (prefix-max island
  * replay, break on STRICT `>`) provably break sessions on the same
  * condition Spark does.
  *
  * Empirical (this spec, Spark 4.1): although each per-event window
  * prints as half-open [ts, ts+gap), the MERGE condition is inclusive —
  * an event landing at EXACTLY the running session end still joins the
  * session; a new session starts only strictly beyond it. The oracles
  * therefore break on `ts > max(prev ts+gap)`; `>=` would split the
  * boundary event.
  */
class SessionBoundarySpec extends SparkSpec {
  import spark.implicits._

  private def sessions(eventsSec: Seq[(Long, Long, String)]) = {
    val gap = when(col("event_type") === "purchase", lit("60 minutes"))
      .otherwise(lit("30 minutes"))
    eventsSec
      .toDF("user_id", "epoch_s", "event_type")
      .withColumn("ts_sec", timestamp_seconds(col("epoch_s")))
      .groupBy(col("user_id"), session_window(col("ts_sec"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("session_window.start").cast("long").as("start_s"),
        col("session_window.end").cast("long").as("end_s"),
        col("n_events"))
      .orderBy("user_id", "start_s")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  test("event at exactly session end still MERGES (inclusive merge rule)") {
    // click at t=0 holds the session open until 0+1800; the next event at
    // exactly 1800 merges and extends the end to 3600.
    val got = sessions(Seq((1L, 0L, "click"), (1L, 1800L, "click")))
    assert(got === Seq((1L, 0L, 3600L, 2L)))
  }

  test("event strictly beyond the gap splits") {
    val got = sessions(Seq((1L, 0L, "click"), (1L, 1801L, "click")))
    assert(got === Seq(
      (1L, 0L, 1800L, 1L),
      (1L, 1801L, 1801L + 1800L, 1L)))
  }

  test("dynamic gap: purchase extends the reach, boundary still inclusive") {
    // purchase at t=0 reaches 3600; click at exactly 3600 merges
    // (extends to 5400); click at exactly 5400 merges again; click at
    // 5401+1800+1 later splits.
    val got = sessions(Seq(
      (2L, 0L, "purchase"), (2L, 3600L, "click"), (2L, 5400L, "click"),
      (2L, 7201L, "click")))
    assert(got === Seq(
      (2L, 0L, 7200L, 3L),
      (2L, 7201L, 7201L + 1800L, 1L)))
  }

  test("oracle replay (prefix-max, break on strict >) agrees on planted boundary data") {
    // The exact island-replay rule the st18 DuckDB oracle uses, run over
    // data that exercises the boundary in both directions.
    val data = Seq(
      (1L, 0L, "click"), (1L, 1800L, "click"),       // exact boundary: merge
      (2L, 0L, "click"), (2L, 1801L, "click"),       // strictly beyond: split
      (3L, 0L, "purchase"), (3L, 3600L, "click"),    // exact purchase reach: merge
      (3L, 5401L, "click"))                          // beyond new end 5400: split
    def gapOf(t: String) = if (t == "purchase") 3600L else 1800L
    val expected = data.groupBy(_._1).toSeq.flatMap { case (u, evs) =>
      var runs = Vector.empty[(Long, Long, Long)] // (start, maxEnd, n)
      evs.sortBy(_._2).foreach { case (_, ts, t) =>
        runs.lastOption match {
          case Some((s, e, n)) if ts <= e =>
            runs = runs.init :+ ((s, math.max(e, ts + gapOf(t)), n + 1))
          case _ =>
            runs = runs :+ ((ts, ts + gapOf(t), 1L))
        }
      }
      runs.map { case (s, e, n) => (u, s, e, n) }
    }.sortBy(r => (r._1, r._2))
    assert(sessions(data) === expected)
  }
}
