package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry invariants the correctness gate depends on: every oracle
  * key must name a real query (a typo would silently drop the check),
  * and every query must carry an oracle — the rows-only set is EMPTY by
  * design since round 6 (f7 ships a gated form), so any unmatched query
  * is a regression in coverage, not a choice.
  */
class RegistrySpec extends AnyFunSuite {
  test("oracles and queries are in 1:1 correspondence") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles naming no query: ${(o -- q).toSeq.sorted}")
    assert((q -- o).isEmpty,
      s"queries without an oracle (would silently demote to rows-only): ${(q -- o).toSeq.sorted}")
  }

  test("registry names are unique across contributing modules") {
    // Map ++ silently overwrites duplicate keys — count contributions
    val parts = Seq(
      graft.queries.ReferenceQueries.queries, graft.queries.ExtensionQueries.queries,
      graft.queries.AnalyticsQueries.queries, graft.queries.PipelineQueries.queries,
      graft.queries.SurfaceQueries.queries, graft.queries.TrainingDataQueries.queries,
      graft.queries.ScaleOpsQueries.queries, graft.queries.WorkloadQueries.queries,
      graft.queries.DecisionQueries.queries, graft.queries.ExperimentQueries.queries)
    val all = parts.flatMap(_.keys)
    val dupes = all.groupBy(identity).filter(_._2.length > 1).keys
    assert(dupes.isEmpty, s"query names defined in more than one module: ${dupes.toSeq.sorted}")
    assert(all.length == SparkEntry.queries.size)
  }
}
