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
