package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-5 operators — properties the
  * hash-oracle can't state (it only proves both engines agree).
  */
class RoundFiveOpsSpec extends SparkSpec {

  test("mmr1: the diversified set is genuinely more diverse than top-5-by-relevance") {
    import graft.functions.VectorMath
    val out = SparkEntry.queries("mmr1_diversified_topk")(spark, sf0001).collect()
    assert(out.length == 5)
    val picked = out.map(_.getAs[Long]("vec_id")).toSeq
    // MMR must preserve the top result (step 1 is pure relevance)...
    val emb = Tables.embeddings(spark, sf0001)
    val q = broadcast(emb.where(col("vec_id") === 0).select(col("embedding").as("qe")))
    val byRel = emb.where(col("vec_id") =!= 0).crossJoin(q)
      .select(col("vec_id"), VectorMath.cosineExact(col("qe"), col("embedding")).as("rel"))
      .orderBy(col("rel").desc, col("vec_id")).limit(5)
      .collect().map(_.getLong(0)).toSeq
    assert(picked.head == byRel.head, "MMR step 1 must be the pure-relevance argmax")

    def maxPairSim(ids: Seq[Long]): Double = {
      val s = emb.where(col("vec_id").isInCollection(ids))
        .select(col("vec_id").as("a"), col("embedding").as("ea"))
      val t = emb.where(col("vec_id").isInCollection(ids))
        .select(col("vec_id").as("b"), col("embedding").as("eb"))
      s.join(t, col("a") < col("b"))
        .select(VectorMath.cosineExact(col("ea"), col("eb")).as("sim"))
        .agg(max("sim")).head.getDouble(0)
    }
    // ...and the set it returns must not be MORE redundant than plain top-k
    assert(maxPairSim(picked) <= maxPairSim(byRel) + 1e-12,
      s"MMR set max-pair-sim ${maxPairSim(picked)} exceeds top-k's ${maxPairSim(byRel)}")
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
