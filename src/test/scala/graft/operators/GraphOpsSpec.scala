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
