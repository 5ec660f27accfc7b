#!/bin/bash
# Single-key fresh-JVM A/B runner (driver-side tooling, not shipped):
# N cold-JVM graft.Bench invocations restricted to the given keys,
# optionally under SPARK_GRAFT_EXTRA_CONFS-style -D overrides, printing
# one per-key line per run. Usage:
#   tools/bench_ab.sh <keys-csv> [n_runs=3] [k=v;k=v ...]
# Unlike bench_runs.sh this has no quiet-box gate: it is for
# COMPARATIVE same-box back-to-back runs, never definitive artifacts.
set -euo pipefail
KEYS="${1:?usage: bench_ab.sh <keys-csv> [n_runs] [confs]}"
N="${2:-3}"
CONFS="${3:-}"
CLASSES="$(dirname "$0")/../target/scala-2.13/classes"
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
DPROPS=""
if [ -n "$CONFS" ]; then
  IFS=';' read -ra KV <<< "$CONFS"
  for kv in "${KV[@]}"; do [ -n "$kv" ] && DPROPS="$DPROPS -D$kv"; done
fi
for i in $(seq 1 "$N"); do
  SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  java $ADDOPENS -Xmx"${SPARK_DRIVER_MEM:-48g}" -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC $DPROPS \
    -cp "$CLASSES:/opt/spark/jars/*" graft.Bench "$KEYS" 2>/dev/null \
    | grep '^{"perkey"'
done
