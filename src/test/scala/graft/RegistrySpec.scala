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

  test("SURVEY.md documents the actual registry size") {
    // The §2.14 preamble went stale twice (said 311 while the registry
    // held 320) — assert the documented count so the doc can't drift.
    val survey = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")),
      "UTF-8")
    val m = """registry holds \*\*(\d+) queries\*\*""".r.findFirstMatchIn(survey)
    assert(m.isDefined, "SURVEY.md no longer contains the registry-size sentence")
    assert(m.get.group(1).toInt == SparkEntry.queries.size,
      s"SURVEY.md says ${m.get.group(1)} queries; registry has ${SparkEntry.queries.size} — update §2.14")
  }
}
