#!/usr/bin/env python3
"""Aggregate N full graft.Bench runs (fresh JVM each) into the
definitive BENCH_LOCAL_r{N}.json artifact: per-key medians across
runs, per-run totals, and the common-key comparison against the
previous round's artifact. Driver-side tooling, not shipped library.

Usage: python3 tools/bench_local.py <round> <out.json> <run1.json> [run2.json ...]
Each run file holds the two Bench output lines ({"perkey":...} and
{"metric":...}).
"""
import json, statistics, sys

rnd = int(sys.argv[1])
out_path = sys.argv[2]
runs = []
totals = []
for p in sys.argv[3:]:
    perkey = None
    total = None
    for line in open(p):
        line = line.strip()
        if line.startswith('{"perkey"'):
            perkey = json.loads(line)["perkey"]
        elif line.startswith('{"metric"'):
            total = json.loads(line)["value"]
    assert perkey and total is not None, f"{p}: missing perkey/metric line"
    runs.append(perkey)
    totals.append(total)

keys = sorted(runs[0])
for r in runs[1:]:
    assert sorted(r) == keys, "key sets differ across runs"
med = {k: round(statistics.median(r[k] for r in runs), 3) for k in keys}
artifact = {
    "round": rnd,
    "sf": 0.1,
    "cpus": 32,
    "n_keys": len(keys),
    "protocol": (f"{len(runs)} full Bench invocations on a quiet box "
                 "(fresh JVM each; per-key min-of-2 with GC between queries), "
                 "median per key across the runs."),
    "totals_per_run_sec": [round(t, 3) for t in totals],
    "total_median_sec": round(statistics.median(totals), 1),
    "sum_of_perkey_medians_sec": round(sum(med.values()), 1),
    "perkey_median_sec": med,
}
json.dump(artifact, open(out_path, "w"), indent=1)
print(f"wrote {out_path}: n_keys={len(keys)} "
      f"sum_of_medians={artifact['sum_of_perkey_medians_sec']} "
      f"totals={artifact['totals_per_run_sec']}")
