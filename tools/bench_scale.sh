#!/usr/bin/env bash
# Scale-up harness (round 13): runs graft.BenchScale at rep=1 and rep=R,
# INTERLEAVED (1,R,1,R,…) so host drift hits both arms, N rounds each.
# Fixtures are materialized once per rep under SPARK_GRAFT_SCALE_FIX and
# reused. Exponents are computed from per-entry medians across runs:
#   exponent = ln(t_R / t_1) / ln(R)
#
# Usage: tools/bench_scale.sh [sf_dir] [R] [N] [out_dir]
set -euo pipefail
SF_DIR="${1:-/root/testdata/sf0.1}"
R="${2:-10}"
N="${3:-3}"
OUT="${4:-bench_runs/scale}"
cd "$(dirname "$0")/.."
mkdir -p "$OUT"
for i in $(seq 1 "$N"); do
  for rep in 1 "$R"; do
    LOG="$OUT/rep${rep}_run${i}.log"
    SPARK_GRAFT_SF_DIR="$SF_DIR" \
    SPARK_GRAFT_SCALE_REP="$rep" \
    SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
      sbt -batch "runMain graft.BenchScale" >"$LOG" 2>&1 || {
        tail -20 "$LOG"; exit 1; }
    grep -o '{"metric".*}' "$LOG" | tail -1 >"$OUT/rep${rep}_run${i}.json" || {
      echo "bench_scale: no JSON line in $LOG" >&2; tail -20 "$LOG"; exit 1; }
    echo "== rep=$rep run=$i: $(cat "$OUT/rep${rep}_run${i}.json" | head -c 200)"
  done
done
python3 tools/scale_report.py "$OUT" "$R"
