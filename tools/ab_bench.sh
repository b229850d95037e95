#!/usr/bin/env bash
# Interleaved A/B bench for optimization work: alternate HEAD (current
# repo classes) and CONTROL (.opt-ctrl worktree classes) runs of a bench
# entry subset in the same window, so host drift hits both arms equally.
# Usage: tools/ab_bench.sh <entries-csv> <n_pairs> <out_dir> [mainClass]
set -uo pipefail
ENTRIES="$1"; N="${2:-3}"; OUT="${3:-/tmp/ab_bench}"; MAIN="${4:-graft.Bench}"
mkdir -p "$OUT"
run() { # arm cpfile idx
  local arm="$1" cpf="$2" i="$3"
  SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  SPARK_GRAFT_BENCH_ONLY="$ENTRIES" \
  java $(for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
           java.nio java.util java.util.concurrent java.util.concurrent.atomic \
           sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
           printf -- "--add-opens java.base/%s=ALL-UNNAMED " "$p"; done) \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Xmx"${SPARK_DRIVER_MEM:-100g}" -XX:ReservedCodeCacheSize=1g -XX:MaxNewSize=2g \
    -cp "$(cat "$cpf")" "$MAIN" 2>/dev/null | grep -o '{"metric".*}' | tail -1 \
    > "$OUT/${arm}_${i}.json"
  echo "== $arm $i: $(head -c 200 "$OUT/${arm}_${i}.json")"
}
for i in $(seq 1 "$N"); do
  run head /tmp/graft_cp.txt "$i"
  run ctrl /tmp/graft_cp_ctrl.txt "$i"
done
python3 - "$OUT" "$N" <<'PY'
import json, statistics, sys
out, n = sys.argv[1], int(sys.argv[2])
arms = {}
for arm in ("head", "ctrl"):
    runs = [json.load(open(f"{out}/{arm}_{i}.json")) for i in range(1, n + 1)]
    arms[arm] = {q: statistics.median([r["queries"][q] for r in runs])
                 for q in runs[0]["queries"]}
print(f"{'entry':28s} {'head':>7s} {'ctrl':>7s} ratio")
for q in arms["head"]:
    h, c = arms["head"][q], arms["ctrl"].get(q, float('nan'))
    print(f"{q:28s} {h:7.3f} {c:7.3f} {h/c:5.2f}x")
PY
