#!/bin/bash
# Round-4 remaining on-chip queue (run ONE at a time; bench.py's guard
# waits out tunnel outages, the probes do not — check the tunnel first):
#   1. final headline bench (champion config, post tri-split/fori-loop)
#   2. compiled-Pallas parity refresh (tri-split changed kernel numerics
#      at the ulp level)
#   3. G_CT micro-sweep (kernels are per-program-overhead-bound)
#   4. full train-step account (where do non-raster ms go?)
#   5. end-to-end train-step bench -> BENCH_TRAIN_r04 numbers
#   6. fresh per-lane device trace for the archive
# Usage: bash tools/run_r4_session.sh [logfile]
cd /root/repo
set -u
LOG=${1:-/tmp/r4_session.log}
: > "$LOG"
say() { echo "=== $* $(date -u +%H:%M:%S) ===" | tee -a "$LOG"; }
PP="/root/repo:${PYTHONPATH:-}"

say "tunnel probe"
timeout -k 10 300 python -c "
import subprocess, sys
r = subprocess.run([sys.executable,'-c','import jax,numpy as np,jax.numpy as jnp;x=jnp.ones((8,8))@jnp.ones((8,8));print(float(np.asarray(x)[0,0]))'],capture_output=True,text=True,timeout=280)
print('probe rc', r.returncode)
assert r.returncode == 0, 'tunnel down'
" 2>&1 | tee -a "$LOG" || { echo "TUNNEL DOWN - aborting" | tee -a "$LOG"; exit 1; }

say "1. headline bench (champion)"
timeout -k 10 2400 python bench.py 2>/dev/null | tee -a "$LOG"

say "2. pallas parity refresh (tri-split numerics)"
PYTHONPATH="$PP" timeout -k 10 3000 python tools/pallas_parity.py 2>&1 | tail -30 | tee -a "$LOG"

say "3. G_CT micro-sweep"
for g in 8 16 24; do
  echo "--- G_CT=$g ---" | tee -a "$LOG"
  PYTHONPATH="$PP" D3GA_G_CT=$g timeout -k 10 2400 python tools/gct_probe.py 2>/dev/null | tee -a "$LOG"
done

say "4. full train-step account"
PYTHONPATH="$PP" timeout -k 10 3000 python tools/train_account.py 2>/dev/null | tee -a "$LOG"

say "5. train-step bench (BENCH_TRAIN_r04 numbers)"
timeout -k 10 3000 python bench_train.py 2>/dev/null | tee -a "$LOG"

say "6. per-lane device trace"
PYTHONPATH="$PP" timeout -k 10 2400 python tools/trace_lanes.py 2>/dev/null | head -30 | tee -a "$LOG"

say "done"
