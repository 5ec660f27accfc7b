#!/usr/bin/env python3
"""Aggregate N full graft.Bench runs (fresh JVM each) into the
definitive BENCH_LOCAL_r{N}.json artifact: per-key medians across
runs, per-run totals, and the common-key comparison against the
previous round's artifact. Driver-side tooling, not shipped library.

Usage: python3 tools/bench_local.py <round> <out.json> <run1.json> [run2.json ...]
Each run file holds the two Bench output lines ({"perkey":...} and
{"metric":...}).
"""
import hashlib, json, os, statistics, sys, time
from concurrent.futures import ProcessPoolExecutor


def _hash_work(_):
    h = hashlib.sha256()
    b = b"y" * 1048576
    for _ in range(64):
        h.update(b)
    return 1


def _sustained_work(_):
    # ~8 s of per-worker sha256 at quiet-box speed (160 x 64 MiB)
    for _ in range(160):
        _hash_work(0)
    return 1


def box_probe():
    """Box-state marker (VERDICT r15 item 5; sustained probe added per
    VERDICT r18 task 3): single-thread and 16-way-parallel CPU probes
    plus load average, captured alongside the aggregation so a noisy
    box is visible IN the artifact instead of burning an adjudication
    cycle next round. The instantaneous probes failed to distinguish
    the round-18 final-snapshot contention (0.122 vs 0.124 parallel
    while every bench run sat 16-35%% high), so the sustained probe
    holds 16 cores busy for ~8 s — intermittent competitors that dodge
    a 0.1 s probe land inside this window."""
    t0 = time.time()
    _hash_work(0)
    single = time.time() - t0
    t0 = time.time()
    with ProcessPoolExecutor(16) as ex:
        list(ex.map(_hash_work, range(16)))
    parallel = time.time() - t0
    t0 = time.time()
    with ProcessPoolExecutor(16) as ex:
        list(ex.map(_sustained_work, range(16)))
    sustained = time.time() - t0
    return {
        "load_avg_1m": round(os.getloadavg()[0], 2),
        "sha256_64MiB_single_sec": round(single, 3),
        "sha256_64MiB_x16_parallel_sec": round(parallel, 3),
        "sha256_sustained_x16_sec": round(sustained, 3),
    }


def data_state(sf_dir="/root/testdata/sf0.1"):
    """Dataset-identity marker (VERDICT r17 task 2): per-table parquet
    row counts plus a cheap content digest (sum of the first integer
    column), so a driver-side testdata REGENERATION can never again
    masquerade as a cross-round perf regression — totals compare only
    when these digests match."""
    try:
        import duckdb
    except ImportError:
        return {"error": "duckdb unavailable"}
    state = {}
    con = duckdb.connect()
    for f in sorted(os.listdir(sf_dir)):
        if not f.endswith(".parquet"):
            continue
        t = f[:-len(".parquet")]
        path = os.path.join(sf_dir, f)
        cols = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{path}')").fetchall()
        digest_col = next(
            (c for c, ty, *_ in cols if ty in ("BIGINT", "INTEGER")), None)
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{path}')").fetchone()[0]
        entry = {"rows": n}
        if digest_col is not None:
            s = con.execute(
                f"SELECT sum(\"{digest_col}\") FROM read_parquet('{path}')"
            ).fetchone()[0]
            entry["digest"] = {"col": digest_col, "sum": int(s) if s is not None else None}
        state[t] = entry
    return state


READING_RULE = (
    "Cross-artifact reading rule: per-key driver-bench numbers are "
    "SINGLE samples on a shared box with an established ~2x swing; a "
    "per-key regression in BENCH_r{N} on untouched code is box noise "
    "until it reproduces in this artifact's per-key MEDIANS across "
    "fresh-JVM runs. Compare medians to medians; compare totals only "
    "when box_state probes are within ~1.5x of the previous round's "
    "(INCLUDING sha256_sustained_x16_sec — the instantaneous probes "
    "missed the round-18 snapshot contention) AND per-run "
    "load_brackets show a quiet box before each run AND data_state "
    "(per-table row counts + digests) matches — a testdata "
    "regeneration makes cross-round totals incomparable (round 17's "
    "adjudication).")

def main():
    rnd = int(sys.argv[1])
    out_path = sys.argv[2]
    runs = []
    totals = []
    brackets = []
    for p in sys.argv[3:]:
        perkey = None
        total = None
        loads = []
        for line in open(p):
            line = line.strip()
            if line.startswith('{"perkey"'):
                perkey = json.loads(line)["perkey"]
            elif line.startswith('{"metric"'):
                total = json.loads(line)["value"]
            elif line.startswith('{"loadavg'):
                loads.append(json.loads(line))
        assert perkey and total is not None, f"{p}: missing perkey/metric line"
        runs.append(perkey)
        totals.append(total)
        brackets.append(loads if loads else None)

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
        "box_state": box_probe(),
        "data_state": data_state(),
        "reading_rule": READING_RULE,
        "totals_per_run_sec": [round(t, 3) for t in totals],
        "total_median_sec": round(statistics.median(totals), 1),
        "sum_of_perkey_medians_sec": round(sum(med.values()), 1),
        # per-run 1m load averages sampled immediately before/after
        # each Bench invocation (tools/bench_runs.sh writes them); a
        # before-load well above ~1 means the run raced a competitor
        "load_brackets": brackets,
        "perkey_median_sec": med,
    }
    # NEVER overwrite an existing artifact (VERDICT r18 task 1: the
    # round-18 end-of-round snapshot silently replaced the definitive
    # bench with a contended re-run). If the target exists, write a
    # suffixed sibling and print the comparison loudly — adjudication
    # picks the keeper on purpose, not by last-writer-wins.
    final_path = out_path
    if os.path.exists(out_path):
        old = json.load(open(out_path))
        old_sum = old.get("sum_of_perkey_medians_sec")
        base = out_path[:-len(".json")] if out_path.endswith(".json") else out_path
        # 'b'..'z', then numeric _b2, _b3, ... (ADVICE r19: a raw
        # ASCII increment walks past 'z' into '{' after 25 siblings)
        candidates = [chr(c) for c in range(ord("b"), ord("z") + 1)]
        candidates += [f"b{i}" for i in range(2, 1000)]
        suffix = next(s for s in candidates
                      if not os.path.exists(f"{base}_{s}.json"))
        final_path = f"{base}_{suffix}.json"
        print(f"REFUSING to overwrite {out_path} (sum_of_medians={old_sum}); "
              f"writing {final_path} (new sum_of_medians="
              f"{artifact['sum_of_perkey_medians_sec']}). Keep ONE on purpose.")
    json.dump(artifact, open(final_path, "w"), indent=1)
    print(f"wrote {final_path}: n_keys={len(keys)} "
          f"sum_of_medians={artifact['sum_of_perkey_medians_sec']} "
          f"totals={artifact['totals_per_run_sec']}")


# __main__ guard: box_probe's ProcessPoolExecutor re-imports this
# module in each worker under the spawn start method — without the
# guard the aggregation (and the pool) would re-run recursively
if __name__ == "__main__":
    main()
