package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's environment-drift defenses (VERDICT r9 #1), unit-tested
  * on the exact round-9 incident: the driver's box degraded for one
  * contiguous stretch of the sorted sweep and published
  * d11_containment_join = 34.0 s against a committed 2.8 s — a 12x
  * phantom that survived median-of-3 because all reps sat inside the
  * bad window. The suspect rule must flag it, the retry must replace
  * it, and a genuine regression must NOT be masked.
  */
class BenchGuardSpec extends AnyFunSuite {

  test("the r9 d11 phantom is flagged as a suspect") {
    assert(Bench.isSuspect(median = 34.0, baseline = Some(2.8)))
  }

  test("a retry at the committed level replaces the phantom reading") {
    // mid-run slowdown: first pass 34.0 s, post-sweep retry 4.0 s — the
    // retry CONFIRMS the 2.8 s baseline (within ConfirmRatio), so the
    // published value is the retry, and both numbers are recorded by
    // Bench under `suspects`.
    assert(Bench.adjudicate(median = 34.0, retry = 4.0, baseline = Some(2.8)) === 4.0)
  }

  test("a genuine regression re-measures slow and keeps its slow reading") {
    assert(Bench.adjudicate(median = 34.0, retry = 35.1, baseline = Some(2.8)) === 34.0)
    // still flagged (suspect record carries both numbers), but the
    // published value does not pretend the regression away
    assert(Bench.isSuspect(median = 34.0, baseline = Some(2.8)))
  }

  test("a failed retry never overwrites the first reading") {
    assert(Bench.adjudicate(median = 34.0, retry = -1.0, baseline = Some(2.8)) === 34.0)
  }

  test("the r10 dr1 incident: a persistent window is labeled, not laundered") {
    // r10's driver run: dr1 committed 2.92 s, first pass 14.37 s, and
    // the post-sweep retry ALSO read 14.4 s — the degradation window
    // outlived the sweep. The old min() rule published 14.37 as a clean
    // reading. Now: the retry does NOT confirm the baseline, so the
    // FIRST reading publishes (retry stays diagnostic)...
    assert(!Bench.retryConfirms(retry = 14.4, baseline = Some(2.92)))
    assert(Bench.adjudicate(median = 14.37, retry = 14.4, baseline = Some(2.92)) === 14.37)
    // ...and the canary probed right after the retry (elevated with the
    // box: say 1.9 s against a 0.5 s pre-sweep reference) marks the
    // reading window_degraded — the artifact self-labels it.
    assert(Bench.isWindowDegraded(canaryS = 1.9, refS = 0.5))
    // a healthy canary after a non-confirming retry means the elevated
    // reading is NOT box-wide: a genuine regression, not a window
    assert(!Bench.isWindowDegraded(canaryS = 0.55, refS = 0.5))
    // an unmeasurable canary reference must never label readings
    assert(!Bench.isWindowDegraded(canaryS = 1.9, refS = -1.0))
  }

  test("an intermittent regression that retries fast is not understated past the baseline") {
    // ADVICE r10: a bimodal genuine regression (committed 2.8, now
    // flapping 34 / 9) must not publish at 9 just because 9 < 34 — 9 is
    // still 3.2x the baseline, so nothing is confirmed and the first
    // reading stands.
    assert(Bench.adjudicate(median = 34.0, retry = 9.0, baseline = Some(2.8)) === 34.0)
    // but a retry inside ConfirmRatio x baseline IS a confirmation
    assert(Bench.retryConfirms(retry = 3.9, baseline = Some(2.8)))
  }

  test("no baseline (new query) and sub-floor jitter are not suspects") {
    assert(!Bench.isSuspect(median = 34.0, baseline = None))
    assert(!Bench.isSuspect(median = 0.2, baseline = Some(0.05))) // 4x but tiny
    assert(!Bench.isSuspect(median = 2.9, baseline = Some(2.8)))
    assert(!Bench.isSuspect(median = -1.0, baseline = Some(2.8))) // failed: reported, not retried
  }

  test("the r12 escapees are flagged at the widened 2x threshold") {
    // VERDICT r12: x18 0.52->2.08 (4.0x) and card2 2.75->7.84 (2.9x)
    // escaped the old 3x-strict rule in that sweep; >=2x vs the
    // committed baseline must always earn one retry.
    assert(Bench.isSuspect(median = 2.08, baseline = Some(0.52)))
    assert(Bench.isSuspect(median = 7.84, baseline = Some(2.75)))
    // exactly 2x is flagged (>=, not >) ...
    assert(Bench.isSuspect(median = 5.6, baseline = Some(2.8)))
    // ... but 1.9x stays ordinary run-to-run drift
    assert(!Bench.isSuspect(median = 5.3, baseline = Some(2.8)))
  }

  test("canary normalization absorbs a box-wide window without loosening the ratio") {
    // VERDICT r13 #7: 14-18 all-environmental suspects per driver sweep,
    // each a query measured inside a box-slowdown window the interleaved
    // canary also shows. A 2.2x reading with the nearest canary itself
    // at 2.2x of the run's best normalizes to ~1x — not a suspect:
    val f = Bench.canaryFactor(nearestS = 0.22, bestS = 0.10)
    assert(f > 2.1 && f < 2.3)
    assert(!Bench.isSuspect(median = 6.2 / f, baseline = Some(2.8)))
    // the SAME 2.2x reading with a FLAT canary stays a suspect — the
    // ratio itself is not loosened:
    assert(Bench.canaryFactor(nearestS = 0.10, bestS = 0.10) == 1.0)
    assert(Bench.isSuspect(median = 6.2, baseline = Some(2.8)))
  }

  test("canary normalization is clamped: no inflation, bounded amnesty") {
    // a canary FASTER than the run's best (impossible by construction,
    // defensive) must never inflate a median into suspicion
    assert(Bench.canaryFactor(nearestS = 0.05, bestS = 0.10) == 1.0)
    // the factor caps at CanaryDegradedRatio: a true 8x regression is
    // still a suspect even measured inside a 5x-degraded window
    assert(Bench.canaryFactor(nearestS = 0.50, bestS = 0.10)
      == Bench.CanaryDegradedRatio)
    assert(Bench.isSuspect(
      median = 22.4 / Bench.canaryFactor(nearestS = 0.50, bestS = 0.10),
      baseline = Some(2.8)))
    // unmeasurable references never normalize
    assert(Bench.canaryFactor(nearestS = -1.0, bestS = 0.10) == 1.0)
    assert(Bench.canaryFactor(nearestS = 0.2, bestS = -1.0) == 1.0)
  }

  test("canary amnesty is logged, never silent (the r14 d2 incident)") {
    // r14 driver sweep: d2_dedup_minhash read 3.43 s against a 1.48 s
    // committed baseline (raw 2.31x — a suspect) while the nearest
    // canary sat ~1.27x above the run's best; normalized 1.82x escaped
    // retry. Legitimate amnesty — but it must publish in the
    // `amnestied` list so it costs one quiet-box A/B, not archaeology.
    assert(Bench.isAmnestied(median = 3.43, factor = 1.27, baseline = Some(1.48)))
    // a reading that is a suspect even after normalization is NOT
    // amnestied — it goes through the retry/adjudication pass
    assert(!Bench.isAmnestied(median = 6.2, factor = 1.27, baseline = Some(1.48)))
    // a reading under the raw bar was never a suspect — nothing to log
    assert(!Bench.isAmnestied(median = 2.0, factor = 1.27, baseline = Some(1.48)))
    // no baseline (new query) → never a suspect → never amnestied
    assert(!Bench.isAmnestied(median = 3.43, factor = 1.27, baseline = None))
    // flat canary (factor 1) can never amnesty anything
    assert(!Bench.isAmnestied(median = 3.43, factor = 1.0, baseline = Some(1.48)))
  }

  test("amnesty is capped: the r15 bm1/wcont1 extremes retry instead of publishing") {
    // VERDICT r15 #5: the r15 driver sweep published bm1 = 9.84 s
    // (baseline 0.67, 14.7x) and wcont1 = 19.49 s (12x) as amnestied
    // first-pass readings — together ~25 s of phantom total. At or past
    // AmnestyCapRatio x the baseline the canary may not absorb the
    // reading; it goes through the normal retry + adjudication.
    assert(!Bench.isAmnestied(median = 9.836, factor = 3.0, baseline = Some(0.669)))
    assert(!Bench.isAmnestied(median = 19.491, factor = 3.0, baseline = Some(1.599)))
    // moderate canary-justified drift is still absorbed (and logged)
    assert(Bench.isAmnestied(median = 1.6, factor = 2.4, baseline = Some(0.669)))
    // the cap is >=: exactly 3x is retried, just under is absorbable
    assert(!Bench.isAmnestied(median = 3.0, factor = 2.4, baseline = Some(1.0)))
    assert(Bench.isAmnestied(median = 2.99, factor = 2.4, baseline = Some(1.0)))
  }

  test("baseline is SF-gated: a detail artifact from another scale never becomes the reference") {
    val detail =
      """{"metric":"detail","value":1.0,"unit":"sec","queries":{"q1":0.5},"sf":"/root/testdata/sf0.01"}"""
    assert(Bench.baselineFromDetail(detail, "/root/testdata/sf0.01") == Map("q1" -> 0.5))
    assert(Bench.baselineFromDetail(detail, "/root/testdata/sf0.1").isEmpty,
      "an sf0.01 dev artifact must not baseline an sf0.1 sweep")
  }

  test("parseDetailQueries reads the committed artifact format") {
    val detail =
      """{"metric":"detail","value":323.201,"unit":"sec","queries":{"a1_groupby_sum":0.521,"d11_containment_join":3.350,"zz_last":-1.000},"stream":{"st1_x":{"data_s":1.0,"overhead_s":2.0}},"sf":"/root/testdata/sf0.1"}"""
    val m = Bench.parseDetailQueries(detail)
    assert(m === Map(
      "a1_groupby_sum" -> 0.521,
      "d11_containment_join" -> 3.35,
      "zz_last" -> -1.0))
  }

  test("parseDetailQueries is total on malformed input") {
    assert(Bench.parseDetailQueries("") === Map.empty)
    assert(Bench.parseDetailQueries("{\"queries\":{") === Map.empty)
    assert(Bench.parseDetailQueries("not json at all") === Map.empty)
  }

  test("the committed bench_detail.json parses and contains the canary") {
    // the suspect rule is only as good as the baseline file it reads —
    // lock that the repo's committed artifact stays parseable and that
    // the canary query both exists in the registry and was measured
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("bench_detail.json")), "UTF-8")
    val m = Bench.parseDetailQueries(txt)
    assert(m.size > 100, s"baseline artifact holds ${m.size} queries — expected the full registry")
    assert(SparkEntry.queries.contains(Bench.CanaryName))
    assert(m.contains(Bench.CanaryName))
  }
}
