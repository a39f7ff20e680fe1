#!/bin/bash
# Round-3 remaining on-chip queue (run ONE at a time; bench.py's own
# guard waits out tunnel outages):
#   1. compiled-Pallas parity refresh (ct kernel is new)
#   2. full-res from-scratch synthetic training (overflow must stay 0)
#   3. fresh device-side profiler trace of the champion raster step
# Usage: bash tools/run_r3_session.sh [logfile]
cd /root/repo
set -u
LOG=${1:-/tmp/r3_session.log}
: > "$LOG"
say() { echo "=== $* $(date -u +%H:%M:%S) ===" | tee -a "$LOG"; }

say "pallas parity refresh (ct kernel)"
PYTHONPATH="/root/repo:${PYTHONPATH:-}" timeout -k 10 3000 python tools/pallas_parity.py 2>&1 | tail -30 | tee -a "$LOG"

say "full-res from-scratch synthetic training (raster_overflow == 0?)"
rm -rf experiments/synthetic_fullres
timeout -k 10 3600 python train.py configs/synthetic_fullres.yml 2>&1 | grep -E "iter |overflow|widened|ERROR" | tail -25 | tee -a "$LOG"
echo "--- overflow summary ---" | tee -a "$LOG"
python - <<'PYEOF' 2>&1 | tee -a "$LOG"
import json
rows = [json.loads(l) for l in open("experiments/synthetic_fullres/metrics.jsonl")]
ov = [r.get("raster_overflow", 0) for r in rows]
print({"logged_steps": len(rows), "max_overflow": max(ov) if ov else None,
       "final_psnr": rows[-1].get("psnr") if rows else None})
PYEOF

say "device trace of the champion raster step"
BENCH_COARSE=dupsort_tile BENCH_DUP=3 PYTHONPATH="/root/repo:${PYTHONPATH:-}" \
  timeout -k 10 2400 python tools/trace_step.py 2>&1 | tail -14 | tee -a "$LOG"

say "DONE"
