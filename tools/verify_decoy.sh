#!/usr/bin/env bash
# Decoy-MV sweep: the full Verify corpus with one decoy materialized view
# registered and the rewrite rule injected into the session optimizer —
# every oracle query's Aggregate nodes run through the MV matcher while
# the decoy can never legitimately serve any of them. Catches the class
# of rewrite-rule bug (e.g. the round-8 inlineProjects crash) that no
# targeted spec shape anticipated. Fails if (a) Verify reports swallowed
# matcher errors (rewriteErrors != 0), or (b) any oracle drifts.
#
# Usage: tools/verify_decoy.sh [sf_dir] [out_dir]
set -euo pipefail
SF_DIR="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/verify_decoy_out}"
cd "$(dirname "$0")/.."
GRAFT_DECOY_MV=1 sbt -batch "runMain graft.Verify $SF_DIR $OUT" \
  || { echo "verify_decoy: Verify failed (swallowed matcher errors?)" >&2; exit 1; }
python3 tools/check_oracle.py "$SF_DIR" "$OUT"
