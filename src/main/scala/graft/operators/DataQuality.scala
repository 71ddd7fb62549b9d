package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus / table audit: the completeness–uniqueness–validity–integrity
  * checks every ingest (the reference validates runs by row counts only —
  * README.md:126-138) needs before data is trusted downstream. Deequ-style
  * metrics, computed relationally.
  *
  * Scale posture: all per-table metrics come from ONE conditional-aggregate
  * pass over the fact table (no per-metric rescans); the referential-
  * integrity check is a single anti-join whose dimension side broadcasts.
  * Output is a tiny long-format (metric, value) table, so the result can
  * be collected, alerted on, or appended to a metrics history cheaply.
  *
  * All metrics are exact BIGINT counts — no floats, so the DuckDB oracle
  * matches bit-for-bit.
  */
object DataQuality {

  /** Per-document Gopher/MassiveText repetition metrics + pass verdict
    * (Rae et al. 2021, appendix A) — ONE definition serving both the
    * gq1 oracle query and the tm1 funnel stage, so the gate can never
    * drift between them. Exact BIGINT numerators/denominators; the
    * verdict is integer cross-multiplication (top word <= 1/8 of words,
    * top bigram <= 1/5, duplicated trigrams <= 3/10, 5 <= n_words <=
    * 100000, mean word length in [2, 10]). See gq1 for the full scale
    * notes.
    *
    * CONTRACT (load-bearing for the tm1/tm2/tm3 one-pass funnels,
    * ADVICE r15): this gate is PER-DOC-PURE — each verdict is a function
    * of that document's own text alone, never of any corpus statistic —
    * and emits EXACTLY ONE output row per input row. The funnel rewrites
    * conjoin stage flags computed over the full corpus; a corpus-level
    * statistic added here (e.g. a global frequency threshold) would make
    * full-corpus flags differ from per-stage survivor flags and silently
    * skew stage counts. `DataQualitySpec` property-pins both halves
    * (subset-invariance + row-count preservation).
    *
    * `barrier` (default true) pins the six metric longs with a lazy
    * localCheckpoint so a batch consumer's `.where(gopher_pass)` cannot
    * push the gate — with every interpreted fold inlined — below this
    * Project and re-evaluate the folds once per reference (measured
    * 3.7→12 s on tm2's gate stage). STREAMING callers pass false
    * (ADVICE r10): inside foreachBatch each batch's checkpoint pins an
    * RDD whose release waits on ContextCleaner GC, so a long-running
    * stream accumulates pinned blocks — and the micro-batch consumer
    * aggregates immediately (no Filter to push), so the barrier buys
    * nothing there.
    */
  def gopherMetrics(docs: DataFrame, barrier: Boolean = true): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val ws = TextAnalysis.words(col("text"))
    // Every metric is a PER-ROW array expression over one tokenization:
    // a word/gram multiset's top count is the longest equal-run of its
    // SORTED array, and its duplicated-gram mass is the total length of
    // runs >= 2 — both one fold over array_sort. The r9 shape computed
    // these with four corpus-wide groupBys (words, (doc,word),
    // (doc,bigram), (doc,trigram)) plus two per-doc row_number windows
    // and four joins back onto doc_id: ~1.6 s at sf0.1 for gopher alone,
    // ALL of it exchange. This shape is zero shuffles, zero joins —
    // the gate never leaves the row (tm2 4.3→2.6 s, gq1 1.9→0.5 s at
    // sf0.1), which is also the 100 TB story: a quality gate should be
    // map-only.
    def maxRun(arr: Column): Column =
      aggregate(
        array_sort(arr),
        struct(lit(null).cast("string").as("prev"),
          lit(0L).as("run"), lit(0L).as("best")),
        (acc, x) => {
          val run = when(x <=> acc.getField("prev"), acc.getField("run") + 1L)
            .otherwise(1L)
          struct(x.as("prev"), run.as("run"),
            greatest(acc.getField("best"), run).as("best"))
        },
        acc => acc.getField("best"))
    def dupRunSum(arr: Column): Column =
      aggregate(
        array_sort(arr),
        struct(lit(null).cast("string").as("prev"),
          lit(0L).as("run"), lit(0L).as("dup")),
        (acc, x) => {
          val same = x <=> acc.getField("prev")
          val closed = acc.getField("dup") +
            when(acc.getField("run") >= 2L, acc.getField("run")).otherwise(0L)
          struct(x.as("prev"),
            when(same, acc.getField("run") + 1L).otherwise(1L).as("run"),
            when(same, acc.getField("dup")).otherwise(closed).as("dup"))
        },
        acc => acc.getField("dup") +
          when(acc.getField("run") >= 2L, acc.getField("run")).otherwise(0L))
    def gramArr(w: Column, n: Int): Column =
      when(size(w) >= n,
        transform(sequence(lit(0), size(w) - n),
          i => concat_ws(" ", slice(w, i + 1, lit(n)))))
        .otherwise(array().cast("array<string>"))
    // null text -> empty array (the r9 explode dropped those rows and
    // coalesced the metrics to 0; size/fold over array() is the same 0)
    val base = docs.select(col("doc_id"),
      coalesce(ws, array().cast("array<string>")).as("w"))
    val metrics = base
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_words"),
        aggregate(col("w"), lit(0L), (a, x) => a + length(x).cast("long"))
          .as("word_chars"),
        maxRun(col("w")).as("top_word_n"),
        maxRun(gramArr(col("w"), 2)).as("top_bigram_n"),
        size(gramArr(col("w"), 3)).cast("long").as("n_trigrams"),
        dupRunSum(gramArr(col("w"), 3)).as("dup_trigram_n"))
    // BARRIER (see scaladoc): pin the six metric longs before the
    // verdict/fraction projection — seven longs per doc is a trivial pin.
    // HOF filter-pushdown BARRIER (the legitimate lazy class): single
    // consumer per gate chain — the pin only stops pushdown from
    // re-evaluating the interpreted fold below the Project (3.7->12 s on
    // tm2 without it); the consuming action materializes it in place
    val pinned = if (barrier) metrics.localCheckpoint(eager = false) else metrics
    pinned
      .select(col("*"),
        (col("top_word_n").cast(DoubleType) /
          nullif(col("n_words"), lit(0L)).cast(DoubleType)).as("top_word_frac"),
        (col("dup_trigram_n").cast(DoubleType) /
          nullif(col("n_trigrams"), lit(0L)).cast(DoubleType)).as("dup_trigram_frac"),
        (col("n_words").between(5L, 100000L) &&
          col("top_word_n") * 8L <= col("n_words") &&
          col("top_bigram_n") * 5L <= col("n_words") - 1L &&
          col("dup_trigram_n") * 10L <= col("n_trigrams") * 3L &&
          col("word_chars") >= col("n_words") * 2L &&
          col("word_chars") <= col("n_words") * 10L).as("gopher_pass"))
  }

  /** Per-document hashed-feature linear quality score + verdict (the
    * fastText-shape gate) — ONE definition serving qc1 and the tm1
    * funnel. Word bigrams hash to B=4096 portable-md5 buckets; the
    * deterministic 4096-row integer weight table broadcasts; the score
    * is the exact-integer dot product Σ count(b)·w(b), gate = score > 0.
    *
    * CONTRACT (ADVICE r15, same as [[gopherMetrics]]): PER-DOC-PURE —
    * the score sees only the doc's own bigrams plus the FIXED broadcast
    * weight table — and exactly one output row per input row. The
    * tm1/tm2/tm3 one-pass funnels depend on both halves; property-pinned
    * in `DataQualitySpec`.
    */
  def linearQualityScores(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType}
    val spark = docs.sparkSession
    val B = 4096
    val weights = broadcast(
      spark.range(B.toLong)
        .select(col("id").as("b"),
          (pmod(Dedup.portableHash60(col("id").cast(StringType)), lit(17L)) - 8L).as("w")))
    val ws = TextAnalysis.words(col("text"))
    val perDoc = docs
      .select(col("doc_id"), ws.as("wd"))
      .where(size(col("wd")) >= 2)
      .select(col("doc_id"),
        explode(sequence(lit(0), size(col("wd")) - 2)).as("i"), col("wd"))
      .select(col("doc_id"),
        pmod(Dedup.portableHash60(concat_ws(" ", slice(col("wd"), col("i") + 1, lit(2)))),
          lit(B.toLong)).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      .join(weights, Seq("b"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_feats"), sum(col("c") * col("w")).as("score"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("score"), lit(0L)).as("score"))
      .withColumn("quality_pass", col("score") > 0L)
  }

  /** Audit `orders` against `customer`: row count, null date count,
    * duplicate primary keys, distinct FK cardinality, domain violations
    * (o_orderstatus outside its enum), non-positive totals, and orphaned
    * foreign keys (o_custkey with no customer row).
    */
  def auditOrders(orders: DataFrame, customer: DataFrame): DataFrame = {
    val onePass = orders.agg(
      count(lit(1)).as("n_rows"),
      count(lit(1)).minus(count(col("o_orderdate"))).as("n_null_date"),
      count(lit(1)).minus(countDistinct(col("o_orderkey"))).as("n_dup_pk"),
      countDistinct(col("o_custkey")).as("n_distinct_cust"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L)
        .otherwise(0L)).as("n_bad_status"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("n_nonpos_total"),
    )
    val orphans = orders
      .join(broadcast(customer.select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphan_cust"))
    val wide = onePass.crossJoin(orphans)
    val metrics = Seq("n_rows", "n_null_date", "n_dup_pk", "n_distinct_cust",
      "n_bad_status", "n_nonpos_total", "n_orphan_cust")
    wide
      .select(metrics.map(m => col(m).cast("long").as(m)): _*)
      .unpivot(Array.empty, metrics.map(col).toArray, "metric", "value")
      .orderBy("metric")
  }

  /** k-anonymity audit: group sizes over a quasi-identifier column set,
    * with an at-risk flag for equivalence classes smaller than k. One
    * partial+final aggregate over the table — grouped-count cost, no
    * self-joins — so it runs as a side-output of any ingest at 100 TB.
    */
  def kAnonymity(df: DataFrame, quasiIds: Seq[String], k: Long): DataFrame =
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("group_n"))
      .withColumn("at_risk", col("group_n") < k)
      .orderBy(quasiIds.map(col): _*)
}
