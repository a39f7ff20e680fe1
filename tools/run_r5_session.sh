#!/bin/bash
# Round-5 on-chip session queue. Run from /root/repo. ONE TPU process
# at a time; waits out tunnel outages between steps (CLAUDE.md).
set -u
cd /root/repo
mkdir -p experiments/r5
LOG=experiments/r5/session.log
exec >>"$LOG" 2>&1

wait_tpu() {
  for i in $(seq 1 160); do
    if timeout -k 10 180 python -c "
import jax, numpy as np, jax.numpy as jnp
x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
assert float(np.asarray(x).ravel()[0]) == 8.0" 2>/dev/null; then
      return 0
    fi
    echo "[$(date +%H:%M:%S)] tunnel down, probe $i/160; sleeping 90s"
    sleep 90
  done
  return 1
}

step() { # tag cmd...
  local tag=$1; shift
  echo "=== [$(date +%H:%M:%S)] $tag: $*"
  wait_tpu || { echo "$tag: TUNNEL NEVER CAME BACK"; return 1; }
  timeout -k 10 3600 "$@"
  echo "=== [$(date +%H:%M:%S)] $tag done rc=$?"
}

# env passed via `env` (a bash `VAR=x funcname` assignment would
# persist past the function call and leak into later steps)
step roofline  python tools/roofline_probe.py
step bench_base env D3GA_BENCH_WAIT=0 python bench.py
echo "--- segsum A/B"
step bench_segsum env D3GA_BENCH_WAIT=0 D3GA_REC_GRAD=segsum python bench.py
step bench_segsum2 env D3GA_BENCH_WAIT=0 D3GA_REC_GRAD=segsum python bench.py
step bench_segsum_exact env D3GA_BENCH_WAIT=0 D3GA_REC_GRAD=segsum BENCH_DEPTH_EXACT=1 python bench.py
step bench_segsum_g24 env D3GA_BENCH_WAIT=0 D3GA_REC_GRAD=segsum D3GA_G_CT=24 python bench.py
step parity_champion env PARITY_COARSE=dupsort_depth PARITY_DUP=3 D3GA_REC_GRAD=segsum \
  python tools/pallas_parity.py
step bench_eval python tools/bench_eval.py
echo "ALL-DONE"
