#!/bin/bash
# Definitive-bench run protocol (VERDICT r18 tasks 1+3): N fresh-JVM
# graft.Bench invocations at sf0.1/32 cpus, each run file carrying the
# 1m load average sampled immediately BEFORE and AFTER the run so the
# aggregator (tools/bench_local.py) can prove per-run box quietness
# instead of relying on one instantaneous probe. Driver-side tooling,
# not shipped library.
#
# Usage: tools/bench_runs.sh <outdir> [n_runs=3]
# Then:  python3 tools/bench_local.py <round> BENCH_LOCAL_r{N}.json <outdir>/run*.txt
set -euo pipefail
OUT="${1:?usage: bench_runs.sh <outdir> [n_runs]}"
N="${2:-3}"
mkdir -p "$OUT"
# Quiet-box gate (VERDICT r19 task 5): REFUSE to start a definitive
# capture on a busy box — r19's definitive artifact started at load
# 2.66 and one run raced a competitor, burning an adjudication cycle.
# Two probes: 1m load must be < 0.5, and the ~10 s sustained 16-way
# sha256 probe must be within 1.5x its historical quiet value (9.9 s
# on this box, measured round 20 at load 0.02). Override with
# BENCH_ALLOW_BUSY=1 only for explicitly non-definitive runs.
if [ "${BENCH_ALLOW_BUSY:-0}" != "1" ]; then
  LOAD="$(cut -d' ' -f1 /proc/loadavg)"
  awk -v l="$LOAD" 'BEGIN{exit !(l<0.5)}' || {
    echo "REFUSED: 1m load $LOAD >= 0.5 — wait for a quiet box or set BENCH_ALLOW_BUSY=1 (non-definitive only)" >&2
    exit 2
  }
  QUIET="${BENCH_QUIET_SUSTAINED_SEC:-9.9}"
  SUST="$(python3 - "$(dirname "$0")" <<'EOF'
import sys, time
sys.path.insert(0, sys.argv[1])
from concurrent.futures import ProcessPoolExecutor
import bench_local
t0 = time.time()
with ProcessPoolExecutor(16) as ex:
    list(ex.map(bench_local._sustained_work, range(16)))
print(round(time.time() - t0, 3))
EOF
)"
  awk -v s="$SUST" -v q="$QUIET" 'BEGIN{exit !(s <= 1.5*q)}' || {
    echo "REFUSED: sustained x16 probe ${SUST}s > 1.5x quiet ${QUIET}s — a competitor is resident; wait or set BENCH_ALLOW_BUSY=1 (non-definitive only)" >&2
    exit 2
  }
  echo "quiet-box gate passed: load $LOAD, sustained x16 ${SUST}s (quiet ref ${QUIET}s)"
fi
CLASSES="$(dirname "$0")/../target/scala-2.13/classes"
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
for i in $(seq 1 "$N"); do
  F="$OUT/run$i.txt"
  : > "$F"
  # let the PREVIOUS run's load decay before sampling, or the before-
  # bracket reads our own residue instead of a competitor (r19 run)
  [ "$i" -gt 1 ] && sleep 60
  echo "{\"loadavg_before\": $(cut -d' ' -f1 /proc/loadavg)}" >> "$F"
  # stderr is kept (run$i.err) and the JVM's own exit status decides:
  # a Bench that dies after printing its lines must not be silently
  # aggregated into the definitive artifact (review r19)
  SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  java $ADDOPENS -Xmx"${SPARK_DRIVER_MEM:-48g}" -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "$CLASSES:/opt/spark/jars/*" graft.Bench 2>"$OUT/run$i.err" \
    | { grep -E '^\{"(perkey|metric)"' || true; } >> "$F"
  grep -q '^{"metric"' "$F" || { echo "run $i: no metric line — see $OUT/run$i.err" >&2; exit 1; }
  echo "{\"loadavg_after\": $(cut -d' ' -f1 /proc/loadavg)}" >> "$F"
  echo "run $i done: $(grep -o '"value":[0-9.]*' "$F" | head -1)"
done
