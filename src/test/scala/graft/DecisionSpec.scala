package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** DecisionQueries semantics + scale-shape guards.
  *
  * ml1's AUC is cross-checked against an INDEPENDENT O(n²) pair count
  * (the Mann–Whitney definition applied literally) — the DuckDB oracle
  * already proves cross-engine agreement, this proves the shared formula
  * both engines implement is actually AUC. ml1/ml2's global ranking runs
  * through the distributed two-pass prefix sum; the window guards assert
  * no partition-less WindowExec sneaks back in over corpus-sized input.
  */
class DecisionSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf0001)

  private def finalPlan(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p: SparkPlan => p
    }
  }

  test("ml1_auc matches the brute-force O(n²) Mann–Whitney pair count") {
    val rows = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("CAST(round(o_totalprice * 100) AS BIGINT) AS c",
        "o_orderstatus = 'F' AS pos")
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    val posScores = rows.filter(_._2).map(_._1)
    val negScores = rows.filterNot(_._2).map(_._1)
    var u2 = 0L // doubled U: win = 2, tie = 1
    for (p <- posScores; n <- negScores) {
      if (p > n) u2 += 2 else if (p == n) u2 += 1
    }
    val expected = u2.toDouble / (2.0 * posScores.length * negScores.length)
    val got = q("ml1_auc").collect().head
    assert(got.getLong(0) === posScores.length.toLong)
    assert(got.getLong(1) === negScores.length.toLong)
    assert(math.abs(got.getDouble(2) - expected) < 1e-12,
      s"AUC ${got.getDouble(2)} != brute-force $expected")
  }

  test("ml2_decile_lift conserves mass and its weighted lift averages to 1") {
    val out = q("ml2_decile_lift").collect()
    assert(out.length === 10, s"expected 10 deciles, got ${out.length}")
    val totalOrders = spark.read.parquet(s"$sf0001/orders.parquet").count()
    assert(out.map(_.getLong(1)).sum === totalOrders,
      "decile buckets must partition every order exactly once")
    // Σ n·lift / Σ n = 1 by construction (lift is rate / overall rate)
    val weighted = out.map(r => r.getLong(1) * r.getDouble(3)).sum / totalOrders
    assert(math.abs(weighted - 1.0) < 1e-9, s"weighted mean lift $weighted != 1")
    // every decile holds ~n/10 rows: rank-selection boundaries can drift
    // by at most the largest tie group, generously bounded here
    val ideal = totalOrders / 10.0
    out.map(_.getLong(1)).foreach(n =>
      assert(n > ideal * 0.5 && n < ideal * 1.5, s"degenerate decile size $n"))
  }

  test("ml1/ml2: no partition-less window over the scored relation") {
    for (name <- Seq("ml1_auc", "ml2_decile_lift")) {
      val windows = finalPlan(SparkEntry.queries(name)(spark, sf0001)).collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
      }
      assert(windows.isEmpty,
        s"$name: global-sort window found — the distributed prefix sum regressed")
    }
  }

  test("tq16: supplier exclusion plans as a broadcast anti join") {
    // sf0.01, not sf0.001: the smallest fixture has no negative-balance
    // suppliers, and AQE rightly deletes an anti join against an empty
    // build side — there would be no join to assert on
    val plan = finalPlan(
      SparkEntry.queries("tq16_supplier_variety")(spark, "/root/testdata/sf0.01")).toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      plan.take(500))
  }

  test("tq18: the HAVING aggregate drives the join — lineitem is scanned once") {
    val plan = finalPlan(q("tq18_large_orders")).toString
    val lineitemScans = plan.linesIterator.count(l =>
      l.contains("FileScan") && l.contains("lineitem"))
    assert(lineitemScans === 1,
      s"expected exactly one lineitem scan, found $lineitemScans")
  }
}
