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

  test("SURVEY.md §2.14 names every registry query, row by row") {
    // The count lock below didn't stop 36 §2.14 rows from silently
    // dropping mid-round-9 (BUILDLOG r9) — the total stayed consistent
    // while individual rows vanished. Lock the PER-ROW inventory:
    // every backticked token in §2.14 shaped like a query name (first
    // segment contains a digit — `d2_dedup_minhash`, `c4g1_c4_gate` —
    // which no cited builtin like `from_json`/`session_window` has)
    // must be a registry key, and every registry key must appear.
    val survey = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")),
      "UTF-8")
    val section = """(?s)### 2\.14.*?(?=\n## |\z)""".r.findFirstIn(survey)
    assert(section.isDefined, "SURVEY.md no longer contains §2.14")
    val namePat = """^[a-z](?=[a-z0-9]*\d)[a-z0-9]*(?:_[a-z0-9]+)+$""".r
    val documented = """`([^`]+)`""".r.findAllMatchIn(section.get)
      .map(_.group(1)).filter(t => namePat.findFirstIn(t).isDefined).toSet
    val keys = SparkEntry.queries.keySet
    assert((documented -- keys).isEmpty,
      s"§2.14 cites queries the registry no longer has: ${(documented -- keys).toSeq.sorted}")
    assert((keys -- documented).isEmpty,
      s"registry queries missing from §2.14's inventory: ${(keys -- documented).toSeq.sorted}")
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
