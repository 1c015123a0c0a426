#!/bin/bash
# Session-7 TPU queue (this session).
#   1. dense serve at 96 requests — session-5's run was interrupted when
#      the driving shell died (apples-to-apples vs paged-96's 208 tok/s).
#   2. per-phase attribution of the resident turn (--phases) for euler-30
#      and dpm-24 — closes the resident-overhead accounting (NOTES_r3).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_r3_session7.log
: > "$LOG"
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $*" >> "$LOG"
}
run python -c "import bench; print('gauge_tflops', bench.chip_gauge()); print('hbm_gbps', bench.hbm_gauge())"
run python bench.py --metric serve_continuous --requests 96 --repeats 1
run python bench.py --metric e2e_resident --phases --repeats 1
run python bench.py --metric e2e_resident --solver dpmpp_2m --steps 24 --phases --repeats 1
echo "ALL DONE $(date)" >> "$LOG"
