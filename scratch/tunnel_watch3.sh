#!/bin/bash
# Probe the tunnel every 4 min; when a tiny host fetch completes, run the
# session-3 queue once and exit.
LOG=/tmp/tunnel_watch3.log
echo "watch start $(date)" >> "$LOG"
cd /root/repo
for i in $(seq 1 60); do
  OK=$(timeout 90 python -c "import jax,jax.numpy as jnp; jax.devices(); print(float(jnp.ones((128,128)).sum()))" 2>/dev/null | tail -1)
  echo "$(date +%H:%M) probe=$OK" >> "$LOG"
  if [ -n "$OK" ]; then
    echo "tunnel healthy, launching session3 queue" >> "$LOG"
    bash scratch/tpu_r3_session3.sh
    echo "queue finished $(date)" >> "$LOG"
    exit 0
  fi
  sleep 240
done
echo "no window found $(date)" >> "$LOG"
