package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: DataFrame connected components agree with a reference
  * union-find on random graphs (same fixed-seed sampling pattern as
  * EnergyPropertiesSpec — the scalatest/scalacheck bridge artifact is
  * not in the offline cache).
  */
class ConnectedComponentsPropSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1234L + i)))

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to the min-id root, matching cluster_id semantics
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("random graphs: components match a reference union-find") {
    val gen = for {
      n <- Gen.choose(2, 60)
      m <- Gen.choose(0, 90)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1) if a != b
      } yield (a.toLong, b.toLong))
    } yield (n, edges)

    for ((n, edges) <- samples(gen, 12)) {
      val nodes = (0L until n.toLong).toDF("id")
      val edgeDf =
        if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("a", "b")
        else edges.toDF("a", "b")
      val got = Dedup.connectedComponents(nodes, edgeDf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = unionFind(n, edges)
      assert(got == expected, s"n=$n edges=$edges")
    }
  }
}
