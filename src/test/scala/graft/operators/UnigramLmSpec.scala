package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer (usp1): hand-computed Viterbi segmentations,
  * the dyadic quantization formula, the lexicographic tie-break, the
  * long-word fallback, and the seed-vocabulary cut. The EM chain
  * end-to-end is oracle-gated (usp1_unigram_lm replays both rounds in
  * DuckDB); these pin the pure pieces the oracle cannot isolate.
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("viterbi picks the max-likelihood segmentation (hand-computed)") {
    // f = q * 256^(len-1); scores for 'abab':
    //   'ab ab'   -> (3*256)^2          = 589824  <- max
    //   'a bab'   -> 2 * 1*65536        = 131072
    //   'aba b'   -> 1*65536 * 1        = 65536
    //   'a ba b'  -> 2 * 2*256 * 1      = 2048
    //   'ab a b'  -> 3*256 * 2 * 1      = 1536
    //   'a b ab'  -> 2 * 1 * 3*256      = 1536
    //   'a b a b' -> 2*1*2*1            = 4
    val q = Map("a" -> 2L, "b" -> 1L, "ab" -> 3L, "ba" -> 2L,
      "aba" -> 1L, "bab" -> 1L)
    assert(UnigramLm.viterbi("abab", q) === Seq("ab", "ab"))
  }

  test("equal-score ties break to the lexicographically smaller segmentation") {
    // 'aaa' under {a->4, aa->8}: 'a aa' = 4*(8*256) = 8192 and
    // 'aa a' = (8*256)*4 = 8192 tie exactly; 'a a a' = 64 loses.
    // 'a aa' < 'aa a' (space sorts before 'a'), so it must win —
    // the same ordering DuckDB's (score DESC, seg) replay uses.
    val q = Map("a" -> 4L, "aa" -> 8L)
    assert(UnigramLm.viterbi("aaa", q) === Seq("a", "aa"))
  }

  test("words past the 128-bit DP bound fall back to character pieces") {
    val w = "a" * (UnigramLm.MaxDpLen + 1)
    val q = Map("a" -> 4L, "aa" -> 8L)
    assert(UnigramLm.viterbi(w, q) === w.map(_.toString))
    // at the bound itself the DP still runs
    assert(UnigramLm.viterbi("a" * UnigramLm.MaxDpLen, q).contains("aa"))
  }

  test("a word with an out-of-vocabulary character fails loudly") {
    val e = intercept[IllegalArgumentException] {
      UnigramLm.viterbi("axa", Map("a" -> 4L))
    }
    assert(e.getMessage.contains("unsegmentable"))
  }

  test("quantize is 1 + (cnt*256) div total, exactly") {
    val q = UnigramLm.quantize(Seq("a" -> 50L, "b" -> 30L, "c" -> 20L))
    assert(q === Map("a" -> 129L, "b" -> 77L, "c" -> 52L)) // total 100
    // zero-count pieces stay segmentable at the smoothing floor
    assert(UnigramLm.quantize(Seq("a" -> 100L, "b" -> 0L))("b") === 1L)
  }

  test("seed candidates count every substring position, frequency-weighted") {
    val wc = Seq(("ab", 2L), ("b", 3L)).toDF("w", "n")
    val got = UnigramLm.seedCandidates(wc)
      .as[(String, Long)].collect().toMap
    // 'ab' contributes a, b, ab twice each; 'b' contributes b thrice
    assert(got === Map("a" -> 2L, "b" -> 5L, "ab" -> 2L))
  }

  test("seed vocab cut: top-V by (cnt DESC, piece) plus all single chars") {
    val wc = Seq(("ab", 2L), ("b", 3L)).toDF("w", "n")
    val cand = UnigramLm.seedCandidates(wc)
    // v=1: top-1 is b(5); chars a, b ride along; 'ab' is cut
    val v1 = UnigramLm.seedVocab(cand, 1).as[(String, Long)].collect().toMap
    assert(v1 === Map("a" -> 2L, "b" -> 5L))
    // v=3: everything survives, no duplicate char rows
    val v3 = UnigramLm.seedVocab(cand, 3).as[(String, Long)].collect()
    assert(v3.length === 3)
  }

  test("train exposes every EM round and keeps the seed-vocab width") {
    val docs = Seq("ab ab b", "b ab").toDF("text")
    val wc = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
    val out = UnigramLm.train(spark, wc, 2, 2)
    assert(out.columns.toSeq === Seq("piece", "cnt_seed", "cnt_r1", "cnt_r2"))
    val rows = out.as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // words: ab(3), b(2); cand: a->3, b->5, ab->3; v=2 top: b(5), a(3);
    // + chars -> vocab {a, b} (ab cut). Segmentation is forced
    // char-wise, so both rounds count a->3, b->5.
    assert(rows === Map("a" -> ((3L, 3L, 3L)), "b" -> ((5L, 5L, 5L))))
  }
}
