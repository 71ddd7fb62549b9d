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

  test("scont2 dominance laws vs the exact scont1 census") {
    val q = graft.SparkEntry.queries
    val exact = q("scont1_semantic_contamination")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    val ivf = q("scont2_semantic_contamination_ivf")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(ivf.nonEmpty)
    var nnHits = 0
    val exactNn = q("scont1_semantic_contamination")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, (nn, cos, cont)) <- ivf) {
      val (exCos, exCont) = exact(id)
      // the probed search can never find a BETTER neighbor than the
      // exact scan (same metric, subset of candidates)
      assert(cos <= exCos + 1e-12, s"vec $id: IVF cosine $cos beats exact $exCos")
      // a contamination verdict from the probe is always confirmed by
      // the exact census (no false alarms — the approximation can only
      // MISS contamination, the documented LSH/IVF trade)
      if (cont) assert(exCont, s"vec $id: IVF flags contamination the exact census denies")
      if (exactNn(id) == nn) nnHits += 1
    }
    // Honest generic-NN recovery floor: the fixture's near-uniform
    // vectors are the ADVERSARIAL case for IVF (little cluster
    // structure for the lists to exploit) — measured 34/100 at
    // nProbe=2/16. Pin a conservative floor so a dial/assignment
    // regression still surfaces; the property that matters for a
    // DECONTAMINATION census (contaminated twins are found) is pinned
    // separately below.
    assert(nnHits >= ivf.length / 4,
      s"IVF census recovered only $nnHits/${ivf.length} exact nearest neighbors")
  }

  test("scont2's probe finds CONTAMINATED twins: near-identical vectors co-assign") {
    // The decontamination guarantee: an eval item that semantically
    // duplicates a train item (cosine >= 0.9) sits so close that both
    // assign to the same inverted list, so the probe cannot miss it —
    // generic NN recall (34% on near-uniform vectors above) is the
    // wrong lens for the census's actual job. Inject twins and assert
    // every one is flagged at rank 1.
    val train = Tables.embeddings(spark, sf0001).where(col("vec_id") < 400)
    val twinIds = Seq(3L, 7L, 11L, 42L, 137L)
    val evalSet = train
      .where(col("vec_id").isin(twinIds: _*))
      .select((col("vec_id") + 10000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + lit(1e-5f)).otherwise(x)).as("embedding"))
    val got = Similarity.ivfTopK(evalSet, train, k = 1, nCentroids = 16, nProbe = 2)
      .select(col("q_vec"), col("c_vec"), col("cosine"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    for (id <- twinIds) {
      val (nn, cos) = got(id + 10000L)
      assert(nn == id, s"twin of $id recovered $nn instead")
      assert(cos >= 0.9, s"twin cosine $cos below the contamination bar")
    }
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

  test("canonicalUrl: the dangling-'&' repair anchors on the FIRST separator (ADVICE r11)") {
    // multi-param survivor set: the greedy [^?]* converted the LAST '&'
    // ('h/p&x=2?y=3'); the fixed [^?&]* restores the real query string
    assert(canon("https://h/p?utm_a=1&x=2&y=3") === Seq("https://h/p?x=2&y=3"))
    // and it must merge with the never-tracked variant
    assert(canon("https://h/p?utm_a=1&x=2&y=3", "https://h/p?x=2&y=3").distinct.size === 1)
    // three survivors
    assert(canon("https://h/p?utm_a=1&a=1&b=2&c=3") === Seq("https://h/p?a=1&b=2&c=3"))
    // repair must not fire past an intact '?': only the first segment
    // before any separator is a repair candidate
    assert(canon("https://h/p?a=1&b=2") === Seq("https://h/p?a=1&b=2"))
  }
}
