#!/bin/bash
# Session-3 TPU queue (runs once the tunnel recovers from the 01:16 hang).
# Goals, in order:
#   1. resident turn: euler-30 / dpm-24 / dpm-15 in ONE window + a profile
#      of the euler case (NOTES_r3 open 1: resident 247 ms/denoise-step vs
#      155 standalone at equal gauge — need the profile to attribute it).
#   2. serving re-measure with the occupancy-fixed defaults (dense 8-slot
#      32-request; paged 12-slot 48-request) + dense/XLA A/B at the same
#      queue depth so the comparison is apples-to-apples.
#   3. stamp gauges at start and end so every number in this block shares
#      a window-quality reading (VERDICT r2 item 8).
cd /root/repo
LOG=/tmp/tpu_r3_session3.log
: > "$LOG"
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $*" >> "$LOG"
}
run python -c "import bench; print('gauge_tflops', bench.chip_gauge()); print('hbm_gbps', bench.hbm_gauge())"

# 1. resident
run python bench.py --metric e2e_resident --repeats 1
run python bench.py --metric e2e_resident --solver dpmpp_2m --steps 24 --repeats 1
run python bench.py --metric e2e_resident --solver dpmpp_2m --repeats 1
run python bench.py --metric e2e_resident --repeats 1 --profile /tmp/prof_resident

# 2. serving, fixed occupancy
run python bench.py --metric serve_continuous --repeats 1
run python bench.py --metric serve_continuous --decode-attn never --repeats 1
run python bench.py --metric serve_continuous --paged --repeats 1
run python bench.py --metric serve_continuous --paged --requests 96 --repeats 1

# 3. closing gauge
run python -c "import bench; print('gauge_tflops', bench.chip_gauge()); print('hbm_gbps', bench.hbm_gauge())"
echo "ALL DONE $(date)" >> "$LOG"
