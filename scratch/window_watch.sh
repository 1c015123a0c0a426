#!/bin/bash
# Probe the tunnel window every ~20 min; when the chip gauge recovers
# (>30 TF/s), run the headline benches once and exit.  Each probe is a
# fresh subprocess so the TPU is free between probes.
LOG=/tmp/window_watch.log
echo "watch start $(date)" >> "$LOG"
for i in $(seq 1 30); do
  G=$(timeout 600 python -c "import bench; print(round(bench.chip_gauge(),1))" 2>/dev/null | tail -1)
  echo "$(date +%H:%M) gauge=$G" >> "$LOG"
  if python -c "import sys; sys.exit(0 if float('${G:-0}' or 0) > 30 else 1)" 2>/dev/null; then
    echo "window good, running benches" >> "$LOG"
    timeout 1800 python bench.py --metric e2e_turn --repeats 1 >> "$LOG" 2>&1
    timeout 1200 python bench.py --metric sdxl_denoise --repeats 1 >> "$LOG" 2>&1
    timeout 1200 python bench.py --metric sdxl_denoise --solver dpmpp_2m --steps 15 --repeats 1 >> "$LOG" 2>&1
    echo "benches done $(date)" >> "$LOG"
    exit 0
  fi
  sleep 1100
done
echo "no good window found" >> "$LOG"
