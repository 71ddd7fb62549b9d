package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("exact dedup groups identical content and keeps the min doc_id") {
    val d = docs(
      1L -> "the quick brown fox",
      2L -> "the quick brown fox",
      3L -> "something else entirely",
    )
    val res = Dedup.exact(d).collect()
    assert(res.length == 2)
    val dup = res.find(_.getAs[Long]("n_copies") == 2).get
    assert(dup.getAs[Long]("keep_doc_id") == 1L)
  }

  test("shingleSets: k-word shingles, distinct, short docs dropped") {
    val d = docs(1L -> "a b c d", 2L -> "x y")
    val sets = Dedup.shingleSets(d, 3).collect()
    assert(sets.length == 1) // doc 2 has < 3 words
    val sh = sets.head.getSeq[String](1).sorted
    assert(sh == Seq("a b c", "b c d"))
  }

  test("minhash: identical docs share a full signature; candidates found") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val d = docs(1L -> base, 2L -> base, 3L -> (1 to 30).map(i => s"other$i").mkString(" "))
    val sigs = Dedup.minHashSignatures(d, k = 3, numHashes = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
    val cands = Dedup.minHashCandidates(d).collect()
    val pair = cands.find(r => r.getLong(1) == 1L && r.getLong(0) == 2L || r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(pair.isDefined, s"expected (1,2) candidate, got ${cands.mkString(";")}")
    assert(math.abs(pair.get.getAs[Double]("jaccard") - 1.0) < 1e-12)
  }

  test("simhash: identical docs get identical signatures, hamming 0") {
    val base = (1 to 20).map(i => s"w$i").mkString(" ")
    val d = docs(10L -> base, 11L -> base)
    val cands = Dedup.simHashCandidates(d, maxHamming = 0).collect()
    assert(cands.length == 1 && cands.head.getAs[Int]("hamming") == 0)
  }

  test("cosine near-dup: identical consecutive vectors score 1.0") {
    val emb = Seq(
      (1L, Array(0.5f, 0.5f, 0.1f)),
      (2L, Array(0.5f, 0.5f, 0.1f)),
      (3L, Array(-0.5f, 0.4f, 0.9f)),
    ).toDF("vec_id", "embedding")
    val res = Dedup.cosineNearDupPairs(emb).orderBy("vec_a").collect()
    assert(res.length == 2)
    assert(math.abs(res.head.getAs[Double]("cosine") - 1.0) < 1e-9)
    assert(res(1).getAs[Double]("cosine") < 0.9)
  }
}
