package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-5 operators — properties the
  * hash-oracle can't state (it only proves both engines agree).
  */
class RoundFiveOpsSpec extends SparkSpec {

  test("mmr1: every greedy step maximizes the documented MMR score given prior picks") {
    import graft.functions.VectorMath
    val out = SparkEntry.queries("mmr1_diversified_topk")(spark, sf0001).collect()
    assert(out.length == 5)
    val picked = out.map(_.getAs[Long]("vec_id")).toSeq

    // Independent driver-side replay of the documented rule over the same
    // top-20 shortlist: step 1 is the pure-relevance argmax; each later
    // step maximizes 0.5·rel − 0.5·max-sim-to-selected, ties on vec_id.
    // (These are the properties MMR guarantees; "more diverse than plain
    // top-k max-pair-sim" is NOT one of them — λ=0.5 bounds nothing about
    // the final set's max pair similarity, so that comparison is logged
    // as an observation, never asserted.)
    val emb = Tables.embeddings(spark, sf0001)
    val q = broadcast(emb.where(col("vec_id") === 0).select(col("embedding").as("qe")))
    val shortlist = emb.where(col("vec_id") =!= 0).crossJoin(q)
      .select(col("vec_id"), VectorMath.cosineExact(col("qe"), col("embedding")).as("rel"))
      .orderBy(col("rel").desc, col("vec_id")).limit(20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val rel = shortlist.toMap
    val ids = shortlist.map(_._1).toSeq
    val s = emb.where(col("vec_id").isInCollection(ids))
      .select(col("vec_id").as("a"), col("embedding").as("ea"))
    val t = emb.where(col("vec_id").isInCollection(ids))
      .select(col("vec_id").as("b"), col("embedding").as("eb"))
    val sim = s.join(t, col("a") =!= col("b"))
      .select(col("a"), col("b"), VectorMath.cosineExact(col("ea"), col("eb")).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    var sel = Vector.empty[Long]
    for (step <- 0 until 5) {
      val expected = ids.filterNot(sel.contains)
        .map { c =>
          val score =
            if (sel.isEmpty) 0.5 * rel(c)
            else 0.5 * rel(c) - 0.5 * sel.map(p => sim((c, p))).max
          (c, score)
        }
        .minBy { case (c, score) => (-score, c) }._1
      assert(picked(step) == expected,
        s"MMR step ${step + 1}: picked ${picked(step)}, replay says $expected " +
          s"(selected so far: $sel)")
      sel :+= picked(step)
    }

    // diversity as an OBSERVATION (not guaranteed by MMR, so not asserted)
    def maxPairSim(set: Seq[Long]): Double =
      set.combinations(2).map { case Seq(x, y) => sim((x, y)) }.max
    val byRel5 = ids.take(5)
    info(f"max-pair-sim: mmr=${maxPairSim(picked)}%.4f topk=${maxPairSim(byRel5)}%.4f")
  }

  test("mk1: dirty-leaf report reconciles exactly with the injected mutations") {
    val out = SparkEntry.queries("mk1_merkle_diff")(spark, sf0001).collect()
    assert(out.nonEmpty)
    val rowsLost = out.map(r => r.getAs[Long]("n_rows_a") - r.getAs[Long]("n_rows_b")).sum
    val dropped = Tables.orders(spark, sf0001)
      .where(col("o_orderkey") % 97 === 0).count()
    // every dropped key sits in some dirty leaf; dirty leaves account for
    // ALL drops and nothing else changes row counts
    assert(rowsLost == dropped, s"dirty leaves lost $rowsLost rows, expected $dropped")
    // price-only mutations (%101, not dropped) must also dirty their leaf
    val priceLeaves = Tables.orders(spark, sf0001)
      .where(col("o_orderkey") % 101 === 0 && col("o_orderkey") % 97 =!= 0)
      .select(expr("o_orderkey div 1000").as("leaf")).distinct()
      .collect().map(_.getLong(0)).toSet
    val dirty = out.map(_.getAs[Long]("leaf")).toSet
    assert(priceLeaves.subsetOf(dirty),
      s"price-mutated leaves ${priceLeaves -- dirty} missing from dirty set")
  }
}
