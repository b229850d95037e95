#!/usr/bin/env python3
"""Per-entry scaling exponents from bench_runs/scale/rep{1,R}_run*.json.

exponent = ln(median_R / median_1) / ln(R); ~0 = churn-proportional
(flat as the corpus grows), ~1 = corpus-proportional, >1 = superlinear
(a real scale bug). Job-count deltas across reps are printed alongside:
a flat job count with elevated wall time points at data volume, a grown
job count at a plan-shape change.
"""
import json, math, glob, statistics, sys

out = sys.argv[1] if len(sys.argv) > 1 else "bench_runs/scale"
R = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def load(rep):
    runs = []
    for f in sorted(glob.glob(f"{out}/rep{rep}_run*.json")):
        runs.append(json.load(open(f)))
    return runs


r1, rR = load(1), load(R)
if not r1 or not rR:
    sys.exit(f"missing runs under {out} (rep1: {len(r1)}, rep{R}: {len(rR)})")

print(f"runs: rep1={len(r1)} rep{R}={len(rR)}   exponent = ln(tR/t1)/ln({R})")
print(f"{'entry':26s} {'t1 med':>8s} {'t%d med' % R:>8s} {'ratio':>7s} "
      f"{'expnt':>6s}  jobs1→jobs{R}")
for q in r1[0]["queries"]:
    m1 = statistics.median(r["queries"][q] for r in r1)
    mR = statistics.median(r["queries"][q] for r in rR)
    ratio = mR / m1
    exp = math.log(ratio) / math.log(R)
    jk = q.split("_")[0] + "_jobs"
    j1 = r1[0].get("meta", {}).get(jk, "")
    jR = rR[0].get("meta", {}).get(jk, "")
    jobs = f"{j1}→{jR}" if j1 != "" else ""
    print(f"{q:26s} {m1:8.3f} {mR:8.3f} {ratio:6.2f}x {exp:6.2f}  {jobs}")
for k in ("li_rows", "orders_rows", "doc_rows"):
    v1 = r1[0].get("meta", {}).get(k)
    vR = rR[0].get("meta", {}).get(k)
    print(f"  {k}: {v1} → {vR}")
