#!/bin/bash
# Wait for the axon TPU tunnel to come back (multi-hour outages happen),
# then run the queued on-chip measurement session exactly once.
# Probe via a subprocess under `timeout -k` (plain SIGTERM does not kill
# a hung jax init — see CLAUDE.md). Usage:
#   bash tools/tunnel_watch.sh [logfile]
cd /root/repo
LOG=${1:-/tmp/tunnel_watch.log}
: > "$LOG"
while true; do
  echo "--- probe $(date -u +%H:%M:%S)" >> "$LOG"
  if timeout -k 10 300 python -c "
import jax, numpy as np, jax.numpy as jnp
x = jnp.ones((128,128))
assert float(np.asarray(x @ x).ravel()[0]) == 128.0
print('TUNNEL OK', jax.devices())
" >> "$LOG" 2>&1; then
    echo "--- tunnel up, starting on-chip session $(date -u +%H:%M:%S)" >> "$LOG"
    bash tools/run_onchip_session.sh /tmp/onchip_session.log >> "$LOG" 2>&1
    echo "--- on-chip session finished $(date -u +%H:%M:%S)" >> "$LOG"
    break
  fi
  sleep 300
done
