#!/bin/bash
# Hands-off on-chip measurement session for after a tunnel outage:
#   1. wait for the tunnel (bench.py's own guard, up to ~25 min)
#   2. champion-config bench (fold + one-exp landed since the last number)
#   3. compiled-Pallas parity refresh (kernels changed: one-exp)
#   4. backward-variant sweep (dupslot / sortpayload / IMG_G)
# Run ONE at a time (single TPU process rule). Usage:
#   bash tools/run_onchip_session.sh [logfile]
cd /root/repo
set -u
LOG=${1:-/tmp/onchip_session.log}
: > "$LOG"
say() { echo "=== $* $(date -u +%H:%M:%S) ===" | tee -a "$LOG"; }

say "baseline bench (champion config, waits for tunnel)"
timeout 3600 python bench.py 2>&1 | tail -3 | tee -a "$LOG"

say "pallas parity refresh"
PYTHONPATH="/root/repo:${PYTHONPATH:-}" timeout 3000 python tools/pallas_parity.py 2>&1 | tail -5 | tee -a "$LOG"

say "variant sweep"
bash tools/run_variant_sweep.sh /tmp/variant_sweep.log 2>&1 | tail -40 | tee -a "$LOG"

say "end-to-end train-step bench (Goliath scale)"
timeout 3600 python bench_train.py 2>&1 | tail -2 | tee -a "$LOG"

say "chained-training timing (chain_steps=10 vs 1, synthetic smoke)"
for CH in 1 10; do
  timeout 3000 python - <<PYEOF 2>&1 | grep "iter \|it/s" | tail -2 | tee -a "$LOG"
import sys, yaml, runpy, shutil
cfg = yaml.safe_load(open('configs/synthetic_smoke.yml'))
cfg['train'].update({'iterations': 100, 'log_n_steps': 50,
                     'checkpoint_n_steps': 1000000,
                     'run_dir': '/tmp/chain_tpu_$CH/', 'chain_steps': $CH})
open('/tmp/chain_tpu_$CH.yml','w').write(yaml.dump(cfg))
shutil.rmtree('/tmp/chain_tpu_$CH', ignore_errors=True)
sys.argv = ['train.py', '/tmp/chain_tpu_$CH.yml']
runpy.run_path('train.py', run_name='__main__')
PYEOF
done

say "DONE"
