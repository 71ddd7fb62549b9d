package graft

/** REGISTRY-WIDE plan sweep (VERDICT r7 #2): every query in
  * `SparkEntry.queries` is planned at sf0.001 and checked for the two
  * shapes that turn a linear plan quadratic-or-serial at 100 TB:
  *
  *  - a `CartesianProduct` anywhere (the broadcast-tiny crossJoins in
  *    the registry plan as BroadcastNestedLoopJoin, never Cartesian);
  *  - a partition-less `WindowExec` — ONE task sorts the world — unless
  *    the query is on the explicit allowlist below, each entry carrying
  *    a one-line proof that the windowed relation is BOUNDED (already
  *    aggregated to a small, data-independent cardinality) before the
  *    window, so the single task touches O(bounded) rows at any corpus
  *    size.
  *
  * The check inspects `queryExecution.sparkPlan` — full analysis +
  * optimization + physical planning, no job execution — so the sweep
  * covers all ~350 queries in seconds-per-query. (AQE never INTRODUCES
  * cartesians or windows; inspecting the pre-adaptive physical plan is
  * the right level for these two shapes.) Invoking a query function may
  * still run its eager side-work (artifact writes, stream drives); at
  * sf0.001 that costs milliseconds each.
  */
class RegistryPlanSweepSpec extends SparkSpec {

  /** query -> boundedness proof for its global (partition-less) window.
    * Every window below runs AFTER an aggregation that collapses the
    * fact table to a small keyed relation, so the single task touches
    * O(bounded) rows at any corpus size — the window never sees facts.
    */
  private val globalWindowAllowlist: Map[String, String] = Map(
    "a18_trimmed_mean" ->
      "window over groupBy(l_returnflag) offsets: |distinct returnflag| = 3 rows",
    "a12_percentile_disc" ->
      "window over groupBy(l_returnflag) offsets: |distinct returnflag| = 3 rows (a18's shape)",
    "cd1_cum_users" ->
      "running sum over per-day new-user counts: bounded by calendar days",
    "dm1_mixture_weights" ->
      "totals over groupBy(lang): bounded by |languages| (tens)",
    "dm2_temperature_mix" ->
      "totals over groupBy(lang): bounded by |languages| (tens)",
    "dm3_budget_apportion" ->
      "largest-remainder rank over groupBy(source): bounded by |sources|",
    "hr1_hierarchical_share" ->
      "share-of-total over groupBy(region, nation): 25 nations max",
    "iv1_open_orders_census" ->
      "sweep-line running sum over distinct boundary DAYS, never orders",
    "km1_life_table" ->
      "reverse-cumulative risk set over distinct day-offsets: bounded by observation-span days",
    "sky1_skyline" ->
      "global pass over per-bucket Pareto fronts only (skyline is mergeable; local pass keeps O(log n)/bucket)",
    "tok2_vocab_coverage" ->
      "rank over TakeOrderedAndProject limit-1000 relation: bound is the literal 1000",
    "ams1_f2_sketch" ->
      "median rank over the 5 estimator-group sums: bound is the literal 5",
    "rrf1_rank_fusion" ->
      "rank over the BM25 leg's TakeOrderedAndProject limit-50 relation: bound is the literal 50",
    "qsk1_sample_quantiles" ->
      "order statistics over the bottom-k hash samples: bound is the literal k=256 (both paths limit first)",
    "st28_stream_quantile_sketch" ->
      "order statistics over the persisted min-k sketch state: bound is the literal k=256",
    "zipf1_rank_frequency" ->
      "rank over the TakeOrderedAndProject limit-40 relation: bound is the literal 40",
    "usp1_unigram_lm" ->
      "total over the trained piece table: bound is the vocab cap (100 + alphabet rows)",
  )

  test("every registry query: no CartesianProduct; global windows bounded + allowlisted") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan =
          try fn(spark, sf0001).queryExecution.sparkPlan
          catch {
            case e: Throwable =>
              fail(s"$name failed to plan at sf0.001: ${e.getMessage.take(200)}")
          }
        val cartesian = plan.collect {
          case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
        }
        val globalWindows = plan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
        }
        val cartErr =
          if (cartesian.nonEmpty) Seq(s"$name: CartesianProduct") else Nil
        val winErr =
          if (globalWindows.nonEmpty && !globalWindowAllowlist.contains(name))
            Seq(s"$name: partition-less Window not on allowlist")
          else Nil
        cartErr ++ winErr
    }
    assert(violations.isEmpty,
      s"\n${violations.mkString("\n")}\n(${violations.size} plan-shape violations)")
  }

  test("allowlist carries no dead entries") {
    val stale = globalWindowAllowlist.keySet.diff(SparkEntry.queries.keySet)
    assert(stale.isEmpty, s"allowlisted names not in the registry: $stale")
  }
}
