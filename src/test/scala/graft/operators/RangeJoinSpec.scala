package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, greatest, least}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq(
    (1L, 5L), (2L, 10L), (3L, 19L), (4L, 20L), (5L, 25L), (6L, 99L),
  ).toDF("point_id", "t")

  private val intervals = Seq(
    (100L, 0L, 10L),   // [0, 10): catches t=5
    (101L, 10L, 20L),  // [10, 20): catches t=10, 19
    (102L, 18L, 26L),  // [18, 26): catches t=19, 20, 25 (overlapping interval)
  ).toDF("interval_id", "start", "end")

  test("points match intervals with start <= t < end, overlaps included") {
    val res = RangeJoin.rangeJoin(points, intervals, "t", "start", "end", bucketWidth = 8)
      .select("point_id", "interval_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(res == Set(
      (1L, 100L), (2L, 101L), (3L, 101L), (3L, 102L), (4L, 102L), (5L, 102L),
    ))
  }

  test("matches the naive inequality join on random-ish data") {
    val ps = (0L until 300L).map(i => (i, (i * 37) % 500)).toDF("point_id", "t")
    val ivs = (0L until 40L).map(i => (i, i * 13, i * 13 + 29)).toDF("interval_id", "start", "end")
    val bucketed = RangeJoin.rangeJoin(ps, ivs, "t", "start", "end", bucketWidth = 32)
      .select("point_id", "interval_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = ps.join(ivs, ps("t") >= ivs("start") && ps("t") < ivs("end"))
      .select("point_id", "interval_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == naive)
  }

  test("fractional bounds: interval reaching past a bucket boundary still matches") {
    val ps = Seq((1L, 10.2)).toDF("point_id", "t")
    val ivs = Seq((1L, 0.0, 10.5)).toDF("interval_id", "start", "end")
    val res = RangeJoin.rangeJoin(ps, ivs, "t", "start", "end", bucketWidth = 10)
    assert(res.count() == 1) // (end-1)-style replication would miss this
  }

  test("no nested-loop join in the bucketed plan") {
    val plan = RangeJoin.rangeJoin(points, intervals, "t", "start", "end", 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(400))
  }

  test("interval overlap: matches the naive join, each pair emitted once") {
    // overlapping chains spanning several buckets each
    val lhs = (0L until 50L).map(i => (i, i * 7, i * 7 + 23)).toDF("lid", "ls", "le")
    val rhs = (0L until 30L).map(j => (j, j * 11 + 3, j * 11 + 19)).toDF("rid", "rs", "re")
    val got = RangeJoin
      .intervalOverlapJoin(lhs, rhs, "ls", "le", "rs", "re", bucketWidth = 16)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = lhs.join(rhs,
      greatest(col("ls"), col("rs")) < least(col("le"), col("re")))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.distinct.length, "a pair was emitted more than once")
    assert(got.toSet == naive.toSet)
    assert(naive.nonEmpty)
  }

  test("interval overlap: empty and touching intervals match nothing") {
    // lid=1 is empty INSIDE a covering right interval — the case where
    // the s1<e2 && s2<e1 shortcut wrongly says "overlap"; lid=2 is
    // empty at a boundary; lid=3 only TOUCHES rid=2's [10,20) (half-open)
    val lhs = Seq((1L, 5L, 5L), (2L, 10L, 10L), (3L, 0L, 10L)).toDF("lid", "ls", "le")
    val rhs = Seq((1L, 0L, 20L), (2L, 10L, 20L)).toDF("rid", "rs", "re")
    val got = RangeJoin
      .intervalOverlapJoin(lhs, rhs, "ls", "le", "rs", "re", bucketWidth = 8)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // only the genuine overlap survives: [0,10) within [0,20)
    assert(got == Set((3L, 1L)),
      s"empty intervals and boundary-touching must not match: $got")
  }

  test("interval overlap: exact at epoch-nanosecond magnitudes (> 2^53)") {
    // double-precision bucket math would misplace boundary buckets here;
    // the long floor-div must keep replication and keep-filter in sync
    val w = 3600L * 1000000000L // 1h in ns
    val base = 1704067200L * 1000000000L + 123456789L
    val lhs = (0L until 30L).map(i => (i, base + i * w / 2, base + i * w / 2 + w))
      .toDF("lid", "ls", "le")
    val rhs = (0L until 30L).map(j => (j, base + j * w / 3 + 7L, base + j * w / 3 + w + 7L))
      .toDF("rid", "rs", "re")
    val got = RangeJoin
      .intervalOverlapJoin(lhs, rhs, "ls", "le", "rs", "re", bucketWidth = w)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = lhs.join(rhs,
      greatest(col("ls"), col("rs")) < least(col("le"), col("re")))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.distinct.length)
    assert(got.toSet == naive.toSet)
    assert(naive.nonEmpty)
  }
}
