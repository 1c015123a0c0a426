#!/bin/bash
# Session-4 TPU queue (session-3 script died with the tunnel at 01:45).
# Priority order — most valuable first in case the tunnel dies again:
#   1. resident dpm-24 (the deployable <5s configuration, VERDICT item 3)
#   2. resident euler-30 + profile (NOTES_r3 open 1: 247 vs 155 ms/step)
#   3. serving re-measure with occupancy-fixed defaults (dense 8-slot
#      32-req; paged 12-slot 48-req) + dense/XLA A/B
#   4. resident dpm-15 cross-check (session-1's 2.66 s is implausible)
# Gauges stamped inside every e2e_resident JSON line (VERDICT item 8).
cd /root/repo
LOG=/tmp/tpu_r3_session4.log
: > "$LOG"
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $*" >> "$LOG"
}
run python -c "import bench; print('gauge_tflops', bench.chip_gauge()); print('hbm_gbps', bench.hbm_gauge())"

# 1. the deliverable
run python bench.py --metric e2e_resident --solver dpmpp_2m --steps 24 --repeats 1

# 2. the mystery + its profile
run python bench.py --metric e2e_resident --repeats 1
run python bench.py --metric e2e_resident --repeats 1 --profile /tmp/prof_resident

# 3. serving, fixed occupancy defaults
run python bench.py --metric serve_continuous --repeats 1
run python bench.py --metric serve_continuous --decode-attn never --repeats 1
run python bench.py --metric serve_continuous --paged --repeats 1
run python bench.py --metric serve_continuous --paged --requests 96 --repeats 1

# 4. cross-check
run python bench.py --metric e2e_resident --solver dpmpp_2m --repeats 1

run python -c "import bench; print('gauge_tflops', bench.chip_gauge()); print('hbm_gbps', bench.hbm_gauge())"
echo "ALL DONE $(date)" >> "$LOG"
