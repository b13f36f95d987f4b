#!/usr/bin/env python3
"""Compare two Bench JSON artifacts query-by-query.

Usage: bench_compare.py <new.json> <old.json> [threshold]
Prints shared-query median/quartile ratios and any mover above the
threshold (default 1.5x), the repo's standing regression bar
(0.95-1.2 is documented host-noise band; re-run >1.5x movers isolated
before calling them regressions).
"""
import json, sys, statistics

new = json.load(open(sys.argv[1]))
old = json.load(open(sys.argv[2]))
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
nq, oq = new["queries"], old["queries"]
shared = sorted(set(nq) & set(oq))
ratios = {q: nq[q] / oq[q] for q in shared if oq[q] > 0}
vals = sorted(ratios.values())
med = statistics.median(vals)
q1 = vals[len(vals) // 4]
q3 = vals[3 * len(vals) // 4]
print(f"shared={len(shared)} new-only={sorted(set(nq)-set(oq))}")
print(f"median={med:.3f} quartiles={q1:.2f}/{q3:.2f} "
      f"total_new={new.get('value')} total_old={old.get('value')}")
movers = {q: r for q, r in ratios.items() if r > thr}
for q, r in sorted(movers.items(), key=lambda kv: -kv[1]):
    print(f"MOVER {q}: {r:.2f}x ({oq[q]:.2f}s -> {nq[q]:.2f}s)")
if not movers:
    print(f"no movers above {thr}x")
