package graft.operators

import org.apache.spark.sql.DataFrame
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
    */
  def gopherMetrics(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val ws = TextAnalysis.words(col("text"))
    val byDoc = Window.partitionBy("doc_id")
    val words = docs.select(col("doc_id"), explode(ws).as("w"))
      .localCheckpoint(eager = false)
    val wstats = words.groupBy("doc_id").agg(
      count(lit(1)).as("n_words"),
      sum(length(col("w")).cast(LongType)).as("word_chars"))
    val topw = words.groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .withColumn("rn",
        row_number().over(byDoc.orderBy(col("c").desc, col("w"))))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("c").as("top_word_n"))
    def grams(n: Int) = docs
      .select(col("doc_id"), ws.as("w"))
      .where(size(col("w")) >= n)
      .select(col("doc_id"),
        explode(sequence(lit(0), size(col("w")) - n)).as("i"), col("w"))
      .select(col("doc_id"),
        concat_ws(" ", slice(col("w"), col("i") + 1, lit(n))).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    val topbg = grams(2)
      .withColumn("rn",
        row_number().over(byDoc.orderBy(col("c").desc, col("g"))))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("c").as("top_bigram_n"))
    val tri = grams(3).groupBy("doc_id").agg(
      sum(col("c")).as("n_trigrams"),
      sum(when(col("c") >= 2L, col("c")).otherwise(0L)).as("dup_trigram_n"))
    docs.select(col("doc_id"))
      .join(wstats, Seq("doc_id"), "left")
      .join(topw, Seq("doc_id"), "left")
      .join(topbg, Seq("doc_id"), "left")
      .join(tri, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("word_chars"), lit(0L)).as("word_chars"),
        coalesce(col("top_word_n"), lit(0L)).as("top_word_n"),
        coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("dup_trigram_n"), lit(0L)).as("dup_trigram_n"))
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
