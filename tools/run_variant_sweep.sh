#!/bin/bash
# One-shot TPU sweep of the round-2 backward variants (run serially —
# ONE TPU process at a time). Usage: bash tools/run_variant_sweep.sh
cd /root/repo
set -u
LOG=${1:-/tmp/variant_sweep.log}
: > "$LOG"

run() {
  echo "=== $* ===" | tee -a "$LOG"
  env "$@" timeout 2400 python bench.py 2>&1 | tail -1 | tee -a "$LOG"
}

echo "--- scatter probe ---" | tee -a "$LOG"
timeout 3000 python tools/scatter_probe.py 2>&1 | tee -a "$LOG"

run D3GA_NOOP=1                                   # champion baseline re-run
run D3GA_REC_GRAD=dupslot
run D3GA_REORDER=sortpayload
run D3GA_REC_GRAD=dupslot D3GA_REORDER=sortpayload
run D3GA_IMG_G=14
run D3GA_IMG_G=21
run D3GA_IMG_G=42
run D3GA_REC_GRAD=dupslot D3GA_REORDER=sortpayload D3GA_IMG_G=21
echo DONE | tee -a "$LOG"
