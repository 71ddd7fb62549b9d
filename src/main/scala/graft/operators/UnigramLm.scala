package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Unigram-LM subword tokenizer training (the SentencePiece shape,
  * Kudo 2018) — the production tokenizer family NEXT to merge-based BPE
  * (`bpe1`-`bpe3`): seed a piece vocabulary from frequent substrings,
  * then alternate (E) Viterbi-segment every word under the current
  * piece probabilities and (M) re-estimate the probabilities from the
  * segmentation counts. This implementation is hard-EM (Viterbi E-step)
  * with every probability a DYADIC-QUANTIZED INTEGER so a second engine
  * replays the whole training chain bit-exactly:
  *
  *   q(piece) = 1 + (cnt(piece) * 256) div total
  *
  * — pure BIGINT integer division, no IEEE op anywhere in the chain
  * (the `ppl1` discipline, taken one step further: not even a
  * power-of-two float multiply). The +1 smooths zero-count pieces so
  * every word stays segmentable and no Viterbi path multiplies by 0.
  *
  * Viterbi maximizes prod q_i / 256^k over segmentations (k pieces).
  * Multiplying through by the common factor 256^n (n = word length)
  * makes the objective prod of per-piece factors f = q * 256^(len-1) —
  * a monotone integer DP. Bound: q <= 257, so a path product is under
  * 256^n * (257/256)^n; for n <= [[MaxDpLen]] = 15 that is < 2^121,
  * inside both engines' 128-bit integer types (Scala BigInt stays
  * exact regardless; the bound is for the DuckDB HUGEINT replay).
  * Words LONGER than MaxDpLen fall back to character segmentation — a
  * deterministic, documented convention on the long tail (none exist
  * in the fixture corpora; real corpora shed them at the Gopher gate).
  * Ties (equal product) break on the lexicographically smallest
  * segmentation string: prefix segmentations of the same consumed span
  * are never string-prefixes of each other (same chars, different
  * space positions), so the tie-break composes under DP extension.
  *
  * Scale posture (the `bpe2` discipline): EM trains on the
  * WORD-FREQUENCY table — vocabulary-sized, never corpus-sized; the
  * corpus is read once to build it. The piece vocabulary is CAPPED
  * (top-V by seed count + all single characters for coverage), so the
  * per-round collects are bounded at V + |alphabet| rows — the same
  * bounded-driver-scalar class as `learnMerges`' 1-row rule collects
  * and `Ids`' |partitions|-row offset maps, NOT a corpus collect. At
  * 100 TB: word-frequency table ~millions of rows (shuffled groupBy),
  * vocab cap 32k-ish, segmentation a mapPartitions over the word
  * table with the capped vocab in the closure — embarrassingly
  * parallel, no shuffle after the word count.
  */
object UnigramLm {

  /** Max piece length considered when seeding the vocabulary. */
  val PieceMaxLen = 3

  /** Dyadic quantization denominator: probabilities live on a 1/256
    * grid. Small enough that a MaxDpLen-piece product fits 128-bit
    * integers in the replaying engine; coarse probabilities only blunt
    * tokenizer QUALITY, never cross-engine agreement.
    */
  val Q = 256L

  /** Longest word the exact-integer Viterbi runs on (see class doc);
    * longer words segment character-wise.
    */
  val MaxDpLen = 15

  /** Per-word character sequences -> candidate pieces: every substring
    * of length 1..[[PieceMaxLen]] of every distinct word, weighted by
    * word frequency (all positions, overlapping). Vocabulary-sized in
    * and out. Input: (w, n); output: (piece, cnt_seed).
    */
  def seedCandidates(wc: DataFrame): DataFrame =
    wc
      .select(col("n"), col("w"),
        explode(sequence(lit(1), length(col("w")))).as("i"))
      .select(col("n"), col("w"), col("i"),
        explode(sequence(lit(1), lit(PieceMaxLen))).as("l"))
      .where(col("i") + col("l") - 1 <= length(col("w")))
      .select(
        expr("substring(w, CAST(i AS INT), CAST(l AS INT))").as("piece"),
        col("n"))
      .groupBy("piece")
      .agg(sum("n").as("cnt_seed"))

  /** The capped seed vocabulary: top `v` candidates by
    * (cnt_seed DESC, piece) plus ALL single-character pieces (with
    * their seed counts) so every word is always segmentable. The
    * union's branches carry identical (piece, cnt_seed) rows for
    * pieces in both, so distinct() is an exact dedup.
    */
  def seedVocab(cand: DataFrame, v: Int): DataFrame =
    cand.orderBy(col("cnt_seed").desc, col("piece")).limit(v)
      .unionByName(cand.where(length(col("piece")) === 1))
      .distinct()

  /** Dyadic-quantized piece probability: q = 1 + (cnt*256) div total.
    * Exact BIGINT in, exact BIGINT out — `div` is integer division in
    * both engines.
    */
  def quantize(cnts: Seq[(String, Long)]): Map[String, Long] = {
    val total = cnts.map(_._2).sum
    require(total > 0, "unigram LM: empty corpus (total piece count 0)")
    cnts.map { case (p, c) => p -> (1L + c * Q / total) }.toMap
  }

  /** Exact-integer Viterbi segmentation of one word under quantized
    * piece probabilities `q`. Returns the pieces in order. BigInt
    * products (never overflows in THIS engine; [[MaxDpLen]] is the
    * replaying engine's 128-bit bound), ties to the lexicographically
    * smallest piece string joined by spaces.
    */
  def viterbi(w: String, q: Map[String, Long]): Seq[String] = {
    val n = w.length
    if (n == 0) return Seq.empty
    if (n > MaxDpLen) return w.map(_.toString)
    // best(j) = (score, seg) over segmentations of w[0, j)
    val best = new Array[(BigInt, String)](n + 1)
    best(0) = (BigInt(1), "")
    var j = 1
    while (j <= n) {
      var l = 1
      while (l <= math.min(PieceMaxLen, j)) {
        val piece = w.substring(j - l, j)
        q.get(piece) match {
          case Some(qp) if best(j - l) != null =>
            // factor f = q * 256^(l-1): the common-denominator form of
            // multiplying by q/256 per piece (class doc)
            var f = BigInt(qp)
            var i = 1
            while (i < l) { f *= Q; i += 1 }
            val score = best(j - l)._1 * f
            val seg =
              if (best(j - l)._2.isEmpty) piece
              else best(j - l)._2 + " " + piece
            if (best(j) == null || score > best(j)._1 ||
                (score == best(j)._1 && seg < best(j)._2))
              best(j) = (score, seg)
          case _ => ()
        }
        l += 1
      }
      j += 1
    }
    require(best(n) != null,
      s"unigram LM: word '$w' unsegmentable — a character is missing " +
        "from the vocabulary (seedVocab keeps all single chars)")
    best(n)._2.split(' ').toSeq
  }

  /** One E-step: Viterbi-segment every distinct word under `q` and
    * return the frequency-weighted piece counts (piece, cnt) —
    * vocabulary-sized. The vocab map in the closure is CAPPED (class
    * doc), not corpus-derived state.
    */
  def emCounts(
      spark: SparkSession, wc: Dataset[(String, Long)],
      q: Map[String, Long]): DataFrame = {
    import spark.implicits._
    wc.mapPartitions(_.flatMap { case (w, n) =>
        viterbi(w, q).map(p => (p, n))
      })
      .toDF("piece", "n")
      .groupBy("piece")
      .agg(sum("n").as("cnt"))
  }

  /** Full training chain: seed -> quantize -> (Viterbi -> recount ->
    * requantize) x `rounds`. Returns one row per seed-vocab piece with
    * the seed count and EVERY round's recount — the output exposes the
    * whole EM chain, so a replaying engine must reproduce each round,
    * not just the final state. Columns: (piece, cnt_seed,
    * cnt_r1..cnt_r{rounds}).
    */
  def train(spark: SparkSession, wc: DataFrame, v: Int, rounds: Int): DataFrame = {
    import spark.implicits._
    require(rounds >= 1, s"rounds >= 1, got $rounds")
    val wcT = wc.select(col("w"), col("n").cast(LongType)).as[(String, Long)]
      .cache()
    val vocab = seedVocab(seedCandidates(wc), v)
    // BOUNDED collect: v + |alphabet| rows (the learnMerges class — a
    // capped model, never a corpus relation).
    val seed: Seq[(String, Long)] =
      vocab.collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    var out = seed.toDF("piece", "cnt_seed")
    var q = quantize(seed)
    for (r <- 1 to rounds) {
      val counted = emCounts(spark, wcT, q)
      // unused vocab pieces keep an explicit 0 — the piece table's
      // width is the SEED vocab for every round
      val roundCnts: Map[String, Long] = counted.collect() // bounded: <= |vocab|
        .map(row => row.getString(0) -> row.getLong(1)).toMap
      val full = seed.map { case (p, _) => (p, roundCnts.getOrElse(p, 0L)) }
      out = out.join(full.toDF("piece", s"cnt_r$r"), Seq("piece"))
      q = quantize(full)
    }
    wcT.unpersist()
    out
  }
}
