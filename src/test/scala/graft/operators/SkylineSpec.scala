package graft.operators

import graft.SparkSpec

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long, Long)]): Set[Long] =
    pts.filterNot { case (id, x, y) =>
      pts.exists { case (_, qx, qy) =>
        qx >= x && qy >= y && (qx > x || qy > y)
      }
    }.map(_._1).toSet

  private def viaOp(pts: Seq[(Long, Long, Long)]): Set[Long] =
    Skyline
      .skyline2D(pts.toDF("id", "x", "y"), "x", "y")
      .select("id")
      .collect()
      .map(_.getLong(0))
      .toSet

  test("skyline matches brute-force dominance on a hand case") {
    // (3,30) dominates (2,20) and (3,10); (1,40) survives on y; the
    // exact duplicate pair (5,5)x2 dominates neither way -> both stay.
    val pts = Seq(
      (1L, 1L, 40L), (2L, 2L, 20L), (3L, 3L, 30L), (4L, 3L, 10L),
      (5L, 5L, 5L), (6L, 5L, 5L))
    assert(viaOp(pts) === brute(pts))
    assert(viaOp(pts) === Set(1L, 3L, 5L, 6L))
  }

  test("skyline matches brute force on 500 pseudorandom points") {
    // Deterministic LCG so the spec is reproducible.
    var s = 12345L
    def next(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L); math.abs(s % 1000) }
    val pts = (1L to 500L).map(i => (i, next(), next()))
    assert(viaOp(pts) === brute(pts))
  }

  test("local pass never drops a global skyline point (mergeability)") {
    // All x distinct, strictly decreasing y -> every point is on the
    // skyline; any bucketing must keep all of them.
    val pts = (1L to 64L).map(i => (i, i, 100L - i))
    assert(viaOp(pts) === pts.map(_._1).toSet)
  }
}
