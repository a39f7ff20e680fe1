#!/bin/bash
# Probe the axon tunnel every 10 min (up to ~4 h); when it answers, run
# the round-4 on-chip session. Designed to run detached:
#   setsid nohup bash tools/wait_and_run_r4.sh > /tmp/r4_wait.log 2>&1 &
cd /root/repo
for i in $(seq 1 24); do
  if timeout -k 10 300 python - <<'EOF' 2>/dev/null
import subprocess, sys
r = subprocess.run(
    [sys.executable, "-c",
     "import jax,numpy as np,jax.numpy as jnp;"
     "x=jnp.ones((8,8))@jnp.ones((8,8));"
     "print(float(np.asarray(x)[0,0]))"],
    capture_output=True, text=True, timeout=280)
sys.exit(r.returncode)
EOF
  then
    echo "tunnel up at attempt $i ($(date -u +%H:%M:%S)); running r4 session"
    bash tools/run_r4_session.sh /tmp/r4_session.log
    echo "R4 SESSION DONE"
    exit 0
  fi
  echo "tunnel down (attempt $i, $(date -u +%H:%M:%S)); sleeping 600s"
  sleep 600
done
echo "tunnel never came back"
