#!/bin/bash
# Session-5 TPU queue. Session-4 results (/tmp/tpu_r3_session4.log):
#   - dpm-24 resident crashed pre-fix (remote-compile SIGKILL on the giant
#     fill program); _fill_like fix validated by the 02:21 dpm-15 run.
#   - resident dpm-15 = 5.97 s @ gauge 16.1 — supersedes session-1's 2.66.
#   - euler-30 resident + profile runs died rc=143 (terminal restart after
#     the SIGKILLed helper, most likely). Re-run here.
# Priority order:
#   0. verify-skill TPU steps (default bench + graft entry forward)
#   1. resident dpm-24 (the deliverable, VERDICT item 3)
#   2. resident euler-30 + profile (NOTES_r3 open 1)
#   3. dense serve at 96 requests (apples-to-apples vs paged-96's 208)
cd /root/repo
LOG=/tmp/tpu_r3_session5.log
: > "$LOG"
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $*" >> "$LOG"
}
run python -c "import bench; print('gauge_tflops', bench.chip_gauge()); print('hbm_gbps', bench.hbm_gauge())"

# 0. verify: flagship forward + default bench JSON line
run python __graft_entry__.py
run python bench.py

# 1. the deliverable
run python bench.py --metric e2e_resident --solver dpmpp_2m --steps 24 --repeats 1

# 2. the mystery + its profile
run python bench.py --metric e2e_resident --repeats 1 --profile /tmp/prof_resident

# 3. serving apples-to-apples
run python bench.py --metric serve_continuous --requests 96 --repeats 1

run python -c "import bench; print('gauge_tflops', bench.chip_gauge()); print('hbm_gbps', bench.hbm_gauge())"
echo "ALL DONE $(date)" >> "$LOG"
