package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for a large-scale training-data pipeline, over
  * the `documents` table. All pure builtin `Column` expressions — fully
  * codegen'd, embarrassingly parallel (no shuffle except final ordering),
  * so they scale linearly with input splits.
  */
object TextAnalysis {

  /** Whitespace tokenization of normalized text. */
  def words(text: Column): Column = split(lower(trim(text)), "\\s+")

  private val enStop = Seq("the", "and", "of", "to", "in")
  private val deStop = Seq("der", "die", "und", "ist", "das")
  private val frStop = Seq("le", "les", "et", "est", "une")
  private val esStop = Seq("el", "los", "y", "es", "una")

  private def hits(ws: Column, set: Seq[String]): Column =
    size(filter(ws, w => w.isInCollection(set)))

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single punctuation marks).
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(words(col("text"))).as("n_tokens"),
      size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
        .as("n_subtokens"),
      length(col("text")).as("n_chars_measured"),
    )

  /** Quality scoring: length, punctuation density, stopword density.
    * Divisors are null-guarded (NULLIF-style): Spark's `Divide` yields
    * null on a zero divisor with ANSI off while DuckDB yields inf/NaN,
    * so an unguarded ratio would diverge cross-engine on empty or
    * whitespace-only documents. Null-on-degenerate matches on both sides.
    */
  def qualityScores(docs: DataFrame): DataFrame = {
    val ws = words(col("text"))
    val nChars = nullif(length(col("text")), lit(0))
    val nPunct = length(regexp_replace(col("text"), "[^.!?,;:]", ""))
    val nTokens = nullif(size(ws), lit(0))
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars_measured"),
      (nPunct.cast(DoubleType) / nChars).as("punct_ratio"),
      (hits(ws, enStop).cast(DoubleType) / nTokens).as("stopword_ratio"),
      (length(col("text")).cast(DoubleType) / nTokens).as("avg_token_len"),
    )
  }

  /** Language ID by stopword-set hit counting (n-gram-free heuristic: the
    * highest-scoring language wins, with a fixed priority order on ties so
    * the result is deterministic).
    */
  def languageId(docs: DataFrame): DataFrame = {
    val ws = words(col("text"))
    docs
      .select(
        col("doc_id"),
        col("lang").as("lang_declared"),
        hits(ws, enStop).as("hits_en"),
        hits(ws, deStop).as("hits_de"),
        hits(ws, frStop).as("hits_fr"),
        hits(ws, esStop).as("hits_es"),
      )
      .withColumn(
        "lang_predicted",
        when(col("hits_en") >= col("hits_de") && col("hits_en") >= col("hits_fr")
          && col("hits_en") >= col("hits_es"), lit("en"))
          .when(col("hits_de") >= col("hits_fr") && col("hits_de") >= col("hits_es"), lit("de"))
          .when(col("hits_fr") >= col("hits_es"), lit("fr"))
          .otherwise(lit("es")),
      )
  }

  /** TRAINED language ID: hashed character-n-gram profile voting — the
    * fastText/Cavnar-Trenkle shape (hashed features → weight table →
    * argmax) next to the stopword heuristic above, derived from the
    * corpus itself instead of a hand list. TRAIN (rows where `isEval`
    * is false): every lowercase char `nGram` hashes into one of
    * `buckets` portable-md5 buckets; the weight of (bucket, lang) is
    * the exact-integer vote share cl·2^20 div cb (cl = that lang's
    * count in the bucket, cb = the bucket total). CLASSIFY (eval
    * rows): each gram votes its bucket's per-lang weights; the doc's
    * prediction is the top vote sum (ties by lang code — fully
    * deterministic, so a SQL oracle replays train + classify end to
    * end). Docs with no scored gram (shorter than the gram, or all
    * buckets unseen in training) predict 'und', never vanish.
    *
    * Returns one row per eval doc: (doc_id, pred_lang, score).
    *
    * Scale shape: training is one groupBy (bucket, lang) over the gram
    * stream — map-side combinable, result ≤ buckets × |langs| rows,
    * BROADCAST to the scorer; classification shuffles only (doc, lang,
    * partial-sum) aggregates and the per-doc argmax plans as the
    * bounded-heap top-1. The corpus text never shuffles.
    */
  def languageIdTrained(
      docs: DataFrame,
      isEval: Column,
      nGram: Int = 3,
      buckets: Int = 4096,
  ): DataFrame = {
    import Dedup.portableHash60
    val grams = docs
      .withColumn("__eval", isEval)
      .where(col("n_chars") >= nGram)
      .select(col("doc_id"), col("lang"), col("__eval"),
        explode(sequence(lit(1L), col("n_chars") - (nGram - 1))).as("p"),
        col("text"))
      .select(col("doc_id"), col("lang"), col("__eval"),
        pmod(portableHash60(expr(s"substring(lower(text), CAST(p AS INT), $nGram)")),
          lit(buckets.toLong)).as("b"))
      .localCheckpoint(eager = true) // train counts + eval scoring share the pass
    val langCounts = grams.where(!col("__eval"))
      .groupBy("b", "lang").agg(count(lit(1)).as("cl"))
    val bucketTotals = langCounts.groupBy("b").agg(sum(col("cl")).as("cb"))
    val weights = langCounts.join(bucketTotals, Seq("b"))
      .select(col("b"), col("lang").as("cand_lang"),
        expr("(cl * 1048576L) div cb").as("w"))
    val votes = grams.where(col("__eval")).select("doc_id", "b")
      .join(broadcast(weights), Seq("b"))
      .groupBy("doc_id", "cand_lang")
      .agg(sum(col("w")).as("score"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("cand_lang"))
    val pred = votes
      .withColumn("rn", row_number().over(wTop))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("cand_lang").as("pred_lang"), col("score"))
    docs.where(isEval).select(col("doc_id"))
      .join(pred, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("pred_lang"), lit("und")).as("pred_lang"),
        coalesce(col("score"), lit(0L)).as("score"))
  }

  /** Term statistics (TF / DF / corpus size) — the relational core of
    * TF-IDF. The score stays rational (tf * (N+1) / (df+1), no log) so it
    * is bit-exact across engines; callers wanting the classic log-scaled
    * IDF apply it to these columns.
    */
  def termStats(docs: DataFrame): DataFrame = {
    val terms = docs.select(col("doc_id"), explode(words(col("text"))).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = terms.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    val n = docs.agg(countDistinct(col("doc_id")).as("n_docs"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .select(
        col("doc_id"), col("term"), col("tf"), col("df"),
        ((col("tf") * (col("n_docs") + 1)) / (col("df") + 1)).as("tfidf_rational"),
      )
  }

  /** Repetition detection (the Gopher-style "repetitive document" signal):
    * per-document top-token frequency ratio and type/token ratio. A doc
    * whose single most frequent token dominates, or whose distinct-token
    * ratio collapses, is boilerplate/spam with high probability.
    *
    * Shape: explode → two-level aggregation. Both group-bys key on doc_id
    * so the second one reuses the first's hash partitioning (one shuffle).
    * Empty/whitespace-only docs have no tokens and drop out — same
    * semantics as the UNNEST-based oracle.
    */
  def repetition(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .where(col("w") =!= "")
    toks
      .groupBy("doc_id", "w")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(
        sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("cnt")).as("top_cnt"),
      )
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("n_distinct"),
        (col("top_cnt").cast(DoubleType) / nullif(col("n_tokens"), lit(0L)))
          .as("top_token_ratio"),
        (col("n_distinct").cast(DoubleType) / nullif(col("n_tokens"), lit(0L)))
          .as("type_token_ratio"),
      )
  }

  /** Email addresses: identical leftmost-first greedy semantics in Java
    * regex and RE2 (no backreferences / lookaround, so both engines agree
    * on every match boundary).
    */
  private val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Long digit runs — the conservative "phone/account number" signal. */
  private val longNumPat = "[0-9]{7,}"

  /** PII scrubbing: count email/long-number occurrences and produce the
    * scrubbed text's digest (the digest, not the text, is what a privacy
    * audit pipeline materializes). Pure narrow projection — codegen'd
    * regex per row, no shuffle, linear scale-out.
    */
  def piiScrub(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(emailPat), lit(0))).as("n_emails"),
      size(regexp_extract_all(col("text"), lit(longNumPat), lit(0))).as("n_long_numbers"),
      md5(
        regexp_replace(
          regexp_replace(col("text"), emailPat, "[EMAIL]"),
          longNumPat,
          "[NUM]")).as("scrubbed_md5"),
    )

  /** Document fingerprinting: polynomial rolling hash over per-word codes
    * (mod a 31-bit prime so the arithmetic is overflow-free in a long and
    * reproducible in any engine).
    */
  def fingerprints(docs: DataFrame): DataFrame = {
    val ws = words(col("text"))
    val wordCode = transform(ws, w => length(w) * lit(31) + ascii(substring(w, 1, 1)))
    val fp = aggregate(
      wordCode,
      lit(0L),
      (acc, x) => (acc * 31 + x) % 1000000007L,
    )
    docs.select(col("doc_id"), fp.as("fingerprint"))
  }

  /** Lexical diversity via the Gini–Simpson index 1 − Σ cntᵢ²/N² — the
    * log-free complement to [[repetition]]'s top-token ratio (a diversity
    * ENTROPY surrogate that needs no transcendental function, so it is
    * bit-identical cross-engine: exact BIGINT count sums, one double
    * division at the end). 0 = one token repeated, → 1 = all distinct.
    *
    * Same two-level doc_id-keyed aggregation shape as [[repetition]]
    * (one shuffle); tokenless docs drop out with the UNNEST semantics.
    */
  def diversity(docs: DataFrame): DataFrame = {
    docs
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .where(col("w") =!= "")
      .groupBy("doc_id", "w")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(
        sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("cnt") * col("cnt")).as("sum_sq"),
      )
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        (lit(1.0) - col("sum_sq").cast(DoubleType) /
          (col("n_tokens").cast(DoubleType) * col("n_tokens").cast(DoubleType)))
          .as("simpson"))
  }

  /** Total-variation distance of each source's token distribution from
    * the whole corpus, from a (source, term, cs) count relation — the
    * shared tail of the batch drift census (tv1) and its streaming twin
    * (st27), so the two can never diverge in definition. TV = Σ|p_s−p|/2
    * cross-multiplies to (Σ_{t∈s} |cs·N − c·N_s| + N_s·(N − cov)) /
    * (2·N_s·N): the missing-term mass folds in closed form, so each
    * source only joins ITS OWN vocabulary to the global counts; the
    * numerator is a BIGINT, and ONE trailing division is double.
    * `counts` must be per-(source, term) EXACT counts — the relation a
    * mergeable ingest accumulates by key-wise summation.
    */
  def totalVariationBySource(counts: DataFrame): DataFrame = {
    val sc = counts.select(col("source"), col("term"), col("cs"))
      .localCheckpoint(eager = true) // feeds global/source totals + join
    val g = sc.groupBy("term").agg(sum(col("cs")).as("c"))
    val ns = sc.groupBy("source").agg(sum(col("cs")).as("n_s"))
    val tot = sc.agg(sum(col("cs")).as("n"))
    sc.join(broadcast(ns), Seq("source"))
      .crossJoin(broadcast(tot))
      .join(g, Seq("term"))
      .groupBy(col("source"), col("n_s"), col("n"))
      .agg(sum(abs(col("cs") * col("n") - col("c") * col("n_s"))).as("s1"),
        sum(col("c")).as("cov"))
      .withColumn("tv_num",
        col("s1") + col("n_s") * (col("n") - col("cov")))
      .select(col("source"), col("n_s").as("n_tokens"), col("tv_num"),
        (col("tv_num").cast(DoubleType) /
          (lit(2.0) * col("n_s").cast(DoubleType) * col("n").cast(DoubleType)))
          .as("tv"))
  }
}
