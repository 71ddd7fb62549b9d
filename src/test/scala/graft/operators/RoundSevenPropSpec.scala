package graft.operators

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Conservation and coverage laws for the round-7 additions — the
  * invariants an oracle hash can't articulate (it proves equality with
  * DuckDB, not that either side computes the RIGHT thing).
  */
class RoundSevenPropSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf0001)

  test("at1: every model's total credit equals total attributed purchase value") {
    // Conservation: each purchase with >=1 touch contributes exactly
    // its milli-cent value to EVERY model's column — first/last
    // trivially, linear by the largest-remainder construction.
    val ev = graft.Tables.events(spark, sf0001)
    val touches = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"))
    val attributedTotal = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("c_user"), col("ts").as("pts"),
        (floor(col("value") * 100).cast("long") * 1000).as("mc"),
        col("event_id"))
      .join(touches,
        col("user_id") === col("c_user") &&
          expr("cts div 1000000000") <= expr("pts div 1000000000") &&
          expr("cts div 1000000000") > expr("pts div 1000000000") - 604800L,
        "left_semi")
      .agg(sum(col("mc"))).head.getLong(0)

    val out = q("at1_attribution").agg(
      sum(col("first_touch_mc")), sum(col("last_touch_mc")),
      sum(col("linear_mc"))).head
    assert(out.getLong(0) == attributedTotal, "first-touch leaks credit")
    assert(out.getLong(1) == attributedTotal, "last-touch leaks credit")
    assert(out.getLong(2) == attributedTotal,
      "linear apportionment does not conserve credit")
    assert(attributedTotal > 0L)
  }

  test("chunker: full coverage, stride-exact starts, bounded size, overlap law") {
    val docs = graft.Tables.documents(spark, sf0001)
    val chunks = q("chunk1_rag_chunking")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), sum(col("n_tokens")).as("tok_sum"),
        max(col("n_tokens")).as("max_len"), min(col("n_tokens")).as("min_len"),
        max(col("chunk_idx")).as("last_idx"))
    val toks = docs.select(col("doc_id"),
      size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n"))
    val joined = chunks.join(toks, Seq("doc_id")).collect()
    assert(joined.nonEmpty)
    for (r <- joined) {
      val (nChunks, tokSum, maxLen, lastIdx, n) =
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("tok_sum"),
          r.getAs[Long]("max_len"), r.getAs[Long]("last_idx"),
          r.getAs[Long]("n"))
      // starts are 0, 24, 48, ... < n  →  count and last index are exact
      val expectChunks = (n + 23) / 24
      assert(nChunks == expectChunks && lastIdx == expectChunks - 1,
        s"doc ${r.getAs[Long]("doc_id")}: $nChunks chunks for $n tokens")
      assert(maxLen <= 32)
      // coverage with overlap: each of the first (nChunks-1) windows
      // contributes its full span; token positions 25..32 of each
      // window are double-counted by the next — total slice length =
      // n + 8·(full 32-windows beyond the first that start ≤ n−32)...
      // simplest exact law: sum of slice lengths == Σ min(32, n − 24i)
      val expectSum = (0L until nChunks).map(i => math.min(32L, n - 24 * i)).sum
      assert(tokSum == expectSum,
        s"doc ${r.getAs[Long]("doc_id")}: slice-length sum $tokSum != $expectSum")
    }
  }

  test("km1: at-risk recursion and subject conservation") {
    val rows = q("km1_life_table").orderBy("day").collect()
    assert(rows.nonEmpty)
    // n_at_risk(t) = n_at_risk(next) + n_events(t) + n_censored(t)
    for (Array(a, b) <- rows.sliding(2)) {
      assert(a.getAs[Long]("n_at_risk") ==
        b.getAs[Long]("n_at_risk") + a.getAs[Long]("n_events") +
          a.getAs[Long]("n_censored"))
    }
    // total subjects = all users with >=1 click
    val subjects = graft.Tables.events(spark, sf0001)
      .where(col("event_type") === "click")
      .select("user_id").distinct().count()
    assert(rows.head.getAs[Long]("n_at_risk") == subjects)
    assert(rows.map(r => r.getAs[Long]("n_events") +
      r.getAs[Long]("n_censored")).sum == subjects)
  }

  test("bs1 weights: thresholds reproduce Poisson(1) pmf to within integer rounding") {
    // The CASE thresholds are floor(P(X<=k)·2^60); check them against
    // an independent computation of the CDF.
    val e = math.exp(-1)
    val cdf = Seq(e, 2 * e, 2.5 * e, e * 8 / 3, e * (8.0 / 3 + 1.0 / 24))
    val expected = cdf.map(c => math.floor(c * math.pow(2, 60)).toLong)
    val inCode = Seq(424136118829305344L, 848272237658610688L,
      1060340297073263360L, 1131029650211480960L, 1148701988496035200L)
    assert(inCode == expected,
      s"bootstrap thresholds drifted from the Poisson CDF: $inCode vs $expected")
    // and the output CI must bracket the point estimate on the fixture
    val r = q("bs1_bootstrap_ci").head
    assert(r.getAs[Double]("ci_lo_cents") <= r.getAs[Double]("mean_cents"))
    assert(r.getAs[Double]("ci_hi_cents") >= r.getAs[Double]("mean_cents"))
  }

  test("imv1: incremental refresh equals full recompute on the same session") {
    val full = graft.Tables.events(spark, sf0001)
      .select(col("event_type"), to_date(col("ts_sec")).as("day"),
        floor(col("value") * 100).cast("long").as("cents"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
      .orderBy("event_type", "day").collect().toSeq
    val inc = q("imv1_incremental_rollup").collect().toSeq
    assert(inc == full, "incremental view drifted from the full recompute")
  }

  test("cv1: folds partition users exactly, deterministically") {
    val out = q("cv1_fold_assignment").collect()
    assert(out.length == 5, s"expected 5 folds, got ${out.length}")
    val users = graft.Tables.events(spark, sf0001)
      .select("user_id").distinct().count()
    assert(out.map(_.getAs[Long]("n_users")).sum == users,
      "fold user counts must partition the user set")
    val again = q("cv1_fold_assignment").collect()
    assert(out.toSeq == again.toSeq, "fold assignment must be deterministic")
  }
}
