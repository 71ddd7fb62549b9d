package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (String, String)*) =
    pairs.toDF("ta", "tb")

  test("triangleCensus on a known graph: K4 has 4 triangles, 12 wedges") {
    // Complete graph on {a,b,c,d}: 6 edges, C(4,3)=4 triangles,
    // each node has deg 3 -> 4 * C(3,2) = 12 wedges.
    val k4 = edges("a" -> "b", "a" -> "c", "a" -> "d",
      "b" -> "c", "b" -> "d", "c" -> "d")
    val r = GraphOps.triangleCensus(k4).collect().head
    assert(r.getLong(0) === 4L)  // n_nodes
    assert(r.getLong(1) === 6L)  // n_edges
    assert(r.getLong(2) === 12L) // n_wedges
    assert(r.getLong(3) === 4L)  // n_triangles
    // clustering = 3*4/12 = 1.0 -> quantized 2^20
    assert(r.getLong(4) === 1048576L)
  }

  test("triangleCensus on a triangle-free graph (star)") {
    val star = edges("hub" -> "x", "hub" -> "y", "hub" -> "z")
    val r = GraphOps.triangleCensus(star).collect().head
    assert(r.getLong(3) === 0L)
    assert(r.getLong(2) === 3L) // hub deg 3 -> 3 wedges
    assert(r.getLong(4) === 0L) // clustering 0
  }

  test("kcorePeeling: K4 core survives, pendants peel by depth") {
    // K4 on {a,b,c,d} is a 3-core; f (deg 1) peels round 1, which drops
    // e (deg 3 via a,b,f while f is alive) to deg 2 — e peels round 2:
    // synchronous peeling, cascade depth = round number
    val g = edges("a" -> "b", "a" -> "c", "a" -> "d",
      "b" -> "c", "b" -> "d", "c" -> "d",
      "e" -> "a", "e" -> "b", "f" -> "e")
    val r = GraphOps.kcorePeeling(g, k = 3, rounds = 4)
      .collect().map(x => x.getString(0) -> (x.getInt(1), x.getBoolean(2))).toMap
    assert(Seq("a", "b", "c", "d").forall(v => r(v) == (0, true)))
    assert(r("f") === ((1, false)))
    assert(r("e") === ((2, false)))
  }

  test("kcorePeeling: a path peels from the ends inward, one layer per round") {
    // path a-b-c-d-e with k=2: ends {a,e} peel round 1, exposing {b,d}
    // round 2, then c round 3 — the round IS the onion layer
    val path = edges("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e")
    val r = GraphOps.kcorePeeling(path, k = 2, rounds = 4)
      .collect().map(x => x.getString(0) -> x.getInt(1)).toMap
    assert(r("a") === 1); assert(r("e") === 1)
    assert(r("b") === 2); assert(r("d") === 2)
    assert(r("c") === 3)
  }

  test("katzWalks: star hub and leaves, hand-computed walk counts") {
    // star hub h, leaves x,y,z: w1(h)=3, w1(leaf)=1; w2(h)=3 (sum of
    // leaf degrees), w2(leaf)=3 (hub degree); w3(h)=9, w3(leaf)=3
    val star = edges("h" -> "x", "h" -> "y", "h" -> "z")
    val r = GraphOps.katzWalks(star)
      .collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
      .toMap
    assert(r("h") === ((3L, 3L, 9L, 16L * 3 + 4L * 3 + 9L)))
    for (l <- Seq("x", "y", "z"))
      assert(r(l) === ((1L, 3L, 3L, 16L + 12L + 3L)))
  }

  test("wlFingerprint: isomorphism-invariant, structure-sensitive") {
    // two isomorphic paths with disjoint node names -> identical label
    // MULTISETS (names never enter the fingerprint)
    val p1 = edges("a" -> "b", "b" -> "c")
    val p2 = edges("x" -> "y", "y" -> "z")
    val f1 = GraphOps.wlFingerprint(p1, rounds = 2)
      .collect().map(_.getString(1)).sorted.toSeq
    val f2 = GraphOps.wlFingerprint(p2, rounds = 2)
      .collect().map(_.getString(1)).sorted.toSeq
    assert(f1 == f2, "isomorphic graphs must fingerprint identically")
    // a 4-star vs a 4-path: same edge count, different degree structure
    val star = edges("a" -> "b", "a" -> "c", "a" -> "d")
    val p4 = edges("a" -> "b", "b" -> "c", "c" -> "d")
    val fs = GraphOps.wlFingerprint(star, rounds = 2)
      .collect().map(_.getString(1)).sorted.toSeq
    val fp4 = GraphOps.wlFingerprint(p4, rounds = 2)
      .collect().map(_.getString(1)).sorted.toSeq
    assert(fs != fp4, "path vs star must differ")
    // within the path: the two ends are WL-equivalent, the middle is not
    val byNode = GraphOps.wlFingerprint(p1, rounds = 2)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byNode("a") == byNode("c"))
    assert(byNode("a") != byNode("b"))
  }

  test("pageRank: a d|scale regular graph is an exact fixed point of the iteration") {
    // On a d-regular graph with d dividing scale every node keeps rank
    // == scale exactly: in-mass = d * (scale div d) = scale, and
    // 0.15*scale + 0.85*scale reassembles scale with no floor loss.
    // (K4 would NOT qualify: 3 does not divide 10^12, so each hop loses
    // one unit to the floor — the 4-cycle's degree 2 does divide.)
    val cycle = edges("a" -> "b", "b" -> "c", "c" -> "d", "a" -> "d")
    val r = GraphOps.pageRank(cycle, iterations = 3).collect()
    assert(r.length === 4)
    assert(r.forall(_.getLong(1) === 1000000000000L))
  }

  test("pageRank: star concentrates rank on the hub, exact integer values") {
    val star = edges("hub" -> "x", "hub" -> "y", "hub" -> "z")
    val r = GraphOps.pageRank(star, iterations = 1).collect()
      .map(row => row.getString(0) -> row.getLong(1)).toMap
    // leaves each send scale to the hub; hub splits scale three ways.
    assert(r("hub") === 150000000000L + 85L * 3000000000000L / 100L)
    val leafExpected = 150000000000L + 85L * (1000000000000L / 3L) / 100L
    assert(r("x") === leafExpected)
    assert(r("y") === leafExpected)
    assert(r("z") === leafExpected)
    assert(r("hub") > r("x"))
  }

  test("pageRank: bit-identical across input partitioning") {
    val chain = edges("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e")
    val base = GraphOps.pageRank(chain, iterations = 3).collect()
      .map(row => row.getString(0) -> row.getLong(1)).toMap
    val repart = GraphOps.pageRank(chain.repartition(7), iterations = 3)
      .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
    assert(base === repart)
  }

  test("termCooccurrenceEdges: capped vocab, ordered pairs, min support") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta"),
      (3L, "alpha beta"),
      (4L, "gamma delta"),
    ).toDF("doc_id", "text")
    val e = GraphOps.termCooccurrenceEdges(docs, topK = 10, minCo = 3L)
      .collect().map(r => (r.getString(0), r.getString(1)))
    // only (alpha, beta) co-occurs in >= 3 docs; pair is ordered ta < tb
    assert(e.toSeq === Seq(("alpha", "beta")))
  }
}
