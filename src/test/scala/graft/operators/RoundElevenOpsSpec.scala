package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariant laws for the round-11 additions and fixes. */
class RoundElevenOpsSpec extends SparkSpec {

  test("sd3 exemplar pre-filter is exact on a degenerate near-identical blob") {
    // A blob of near-identical vectors shares every LSH bucket (that is
    // LSH working), so pre-filter correctness decides both exactness
    // and the linear-cost claim: every blob member except the senior
    // one must drop, organic far-apart vectors must all survive, and
    // the result must agree with a plain pairwise replay of the same
    // bucket semantics (the pre-filter is a plan change, not a
    // semantics change).
    val organic = Tables.embeddings(spark, sf0001).where(col("vec_id") < 40)
    val dim = 64
    import spark.implicits._
    val blob = (1000L until 1030L).map { id =>
      // identical base vector + tiny dim-0 jitter (cosine ≈ 1)
      val v = Array.tabulate(dim)(i => (((i * 13) % 19 - 9) / 9.0f))
      v(0) = v(0) + id * 1e-6f
      (id, v.toSeq, 0)
    }.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
    val corpus = organic.select("vec_id", "embedding", "label")
      .unionByName(blob)
    val got = Dedup.semanticDedupBucketed(corpus, minCosine = 0.3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // blob: only the senior member survives
    assert(got(1000L), "the senior blob member must be kept")
    for (id <- 1001L until 1030L)
      assert(!got(id), s"blob member $id must drop against a senior twin")
    // exactness vs the unfiltered pairwise replay of the SAME semantics
    val exact = Dedup.semanticDedup(corpus, minCosine = 0.3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // sd3 is allowed to MISS dups sd2 finds (LSH recall), but on a
    // cosine≈1 blob collision is certain, so the blob verdicts agree;
    // and sd3 must never drop something sd2 keeps (no false dups).
    for ((id, kept) <- got if !kept)
      assert(!exact(id), s"sd3 dropped $id which exact SemDeDup keeps")
  }

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("url").select(Dedup.canonicalUrl(col("url"))).as[String].collect().toSeq
  }

  test("canonicalUrl: a stripped FIRST utm param leaves no dangling '&' (ADVICE r10)") {
    // the bug class: '?utm_a=1&x=2' loses its '?' with the utm strip
    assert(canon("https://h/p?utm_a=1&x=2") === Seq("https://h/p?x=2"))
    // and the canonical key must MERGE with the never-tracked variant
    assert(canon("https://h/p?utm_a=1&x=2", "https://h/p?x=2").distinct.size === 1)
    // two leading utm params, then a real one
    assert(canon("https://h/p?utm_a=1&utm_b=2&x=1") === Seq("https://h/p?x=1"))
    // the already-handled case ('?' survives) still repairs
    assert(canon("https://h/p?a=1&utm_b=2") === Seq("https://h/p?a=1"))
    // all params tracking -> bare path, trailing slash stripped
    assert(canon("HTTPS://H/p/?utm_a=1&utm_b=2#frag") === Seq("https://h/p"))
    // no-op on clean URLs
    assert(canon("https://h/p?x=2&y=3") === Seq("https://h/p?x=2&y=3"))
  }
}
