#!/usr/bin/env bash
# Round-12 gate re-measure: interleaved HEAD vs r9-HEAD (03eeede) control
# runs in the same window — the round-10 e14 attribution method. HEAD and
# control alternate so any host-load drift hits both arms equally; if the
# e17 elevation is environmental both arms read the same, if HEAD is
# reproducibly slower the rounds 10-11 diff is implicated.
#
# Usage: tools/bench_interleaved.sh [n_pairs] [out_dir]
set -uo pipefail
N="${1:-3}"
OUT="${2:-/root/repo/bench_runs}"
mkdir -p "$OUT"
for i in $(seq 1 "$N"); do
  echo "=== pair $i: HEAD ==="
  (cd /root/repo/.bench-head && tools/bench_driver.sh /root/testdata/sf0.1 "$OUT/head_$i.json") || echo "HEAD run $i FAILED"
  echo "=== pair $i: r9 control ==="
  (cd /root/repo/.ctrl-r9 && tools/bench_driver.sh /root/testdata/sf0.1 "$OUT/ctrl_$i.json") || echo "ctrl run $i FAILED"
done
echo "=== interleaved block done ==="
