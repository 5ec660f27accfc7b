#!/usr/bin/env python3
"""Compare two BENCH_LOCAL artifacts under the repo's reading rule —
the adjudication that burned rounds 17 and 18, as one command.

Usage: python3 tools/bench_diff.py BENCH_LOCAL_rA.json BENCH_LOCAL_rB.json

Prints, in order:
  1. comparability: box_state probe ratios (must be within ~1.5x,
     including the sustained probe when both carry it) and data_state
     row-count/digest equality (totals are incomparable on mismatch);
  2. common-key median sums and the headline delta;
  3. per-key deltas beyond the documented ~2x single-key swing,
     largest first (anything inside the swing is box noise by rule).
Driver-side tooling, not shipped library.
"""
import json, sys


def main():
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    print(f"A = {sys.argv[1]} (round {a.get('round')}, n_keys {a.get('n_keys')})")
    print(f"B = {sys.argv[2]} (round {b.get('round')}, n_keys {b.get('n_keys')})")

    comparable = True
    pa, pb = a.get("box_state", {}), b.get("box_state", {})
    for probe in sorted(set(pa) & set(pb)):
        # skip only on None/non-numeric — a 0.0 load on one side must
        # still flag a busy opposite side (ADVICE r19); epsilon guards
        # the ratio instead of truthiness
        va, vb = pa[probe], pb[probe]
        if not isinstance(va, (int, float)) or not isinstance(vb, (int, float)):
            continue
        r = vb / max(va, 1e-9)
        if probe == "load_avg_1m":
            # a LOW load average is never a comparability problem; only
            # a busy box at capture time is
            flag = "" if max(pa[probe], pb[probe]) < 2.0 else \
                "  <-- busy box at capture: treat that side's totals with care"
        else:
            flag = "" if 1 / 1.5 <= r <= 1.5 else \
                "  <-- OUTSIDE 1.5x: totals not comparable"
            if flag:
                comparable = False
        print(f"  probe {probe}: {pa[probe]} vs {pb[probe]} (x{r:.2f}){flag}")
    da, db = a.get("data_state"), b.get("data_state")
    if da is None or db is None:
        comparable = False
        side = "A" if da is None else "B"
        print(f"  data_state: absent in {side} (pre-round-18 artifact) — "
              "totals not provably anchored on identical data")
    elif da != db:
        comparable = False
        bad = [t for t in sorted(set(da) | set(db)) if da.get(t) != db.get(t)]
        print(f"  data_state MISMATCH on {bad} — totals NOT comparable "
              "(testdata regeneration; per-key medians only where rows match)")
    else:
        print("  data_state: identical (rows + digests)")

    ka, kb = a["perkey_median_sec"], b["perkey_median_sec"]
    common = sorted(set(ka) & set(kb))
    sa, sb = sum(ka[k] for k in common), sum(kb[k] for k in common)
    verdictable = "comparable" if comparable else "NOT comparable (see above)"
    print(f"\ncommon keys: {len(common)}  sum A {sa:.1f}s  sum B {sb:.1f}s  "
          f"delta {100 * (sb - sa) / sa:+.1f}%  [{verdictable}]")
    only_a, only_b = sorted(set(ka) - set(kb)), sorted(set(kb) - set(ka))
    if only_a:
        print(f"only in A: {only_a}")
    if only_b:
        print(f"only in B: {only_b} (sum {sum(kb[k] for k in only_b):.1f}s)")

    # per-key beyond-swing movers: the rule treats < 2x per-key moves
    # between MEDIAN artifacts as noise only when small in absolute
    # terms; surface ratio > 2x or |delta| > 0.5 s
    movers = [(k, ka[k], kb[k]) for k in common
              if (max(ka[k], kb[k]) / max(min(ka[k], kb[k]), 1e-3) > 2.0
                  and abs(kb[k] - ka[k]) > 0.1) or abs(kb[k] - ka[k]) > 0.5]
    movers.sort(key=lambda t: -abs(t[2] - t[1]))
    if movers:
        print("\nbeyond-swing movers (ratio>2x & >0.1s, or >0.5s abs):")
        for k, va, vb in movers[:20]:
            print(f"  {k}: {va:.2f} -> {vb:.2f}  ({vb - va:+.2f}s)")
    else:
        print("\nno per-key mover beyond the documented swing")


if __name__ == "__main__":
    main()
