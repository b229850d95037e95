#!/usr/bin/env bash
# Driver-protocol bench harness: ONE JVM, Bench.scala suite order, the
# exact invocation the per-round BENCH_r{N}.json is produced with. The
# round-5 gate breach came from the builder measuring fresh-JVM per-block
# medians while the driver measured a single long-lived JVM — numbers in
# BASELINE.md must come from THIS script so both sides grade the same
# experiment.
#
# Usage: tools/bench_driver.sh [sf_dir] [out_json]
#   sf_dir   default /root/testdata/sf0.1
#   out_json default /tmp/bench_driver.json (the one-line JSON the driver
#            parses, extracted from sbt stdout)
set -euo pipefail
SF_DIR="${1:-/root/testdata/sf0.1}"
OUT="${2:-/tmp/bench_driver.json}"
LOG="${OUT%.json}.log"
cd "$(dirname "$0")/.."
SPARK_GRAFT_SF_DIR="$SF_DIR" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-100g}" \
  sbt -batch "runMain graft.Bench" >"$LOG" 2>&1 || { tail -20 "$LOG"; exit 1; }
# sbt can exit 0 with the bench aborted before its JSON line (swallowed
# OOM, output drift) — under pipefail a bare grep miss would kill the
# script with no diagnostic, so make that failure self-describing
grep -o '{"metric".*}' "$LOG" | tail -1 >"$OUT" || {
  echo "bench_driver: no '{\"metric\"...}' line in $LOG" >&2
  tail -20 "$LOG"; exit 1; }
python3 - "$OUT" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
print(f"total {d['value']:.3f}s @ {d['sf']}")
for k, v in d["queries"].items():
    print(f"  {k:24s} {v:8.3f}")
EOF
