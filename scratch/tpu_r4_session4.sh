#!/bin/bash
# Round-4 TPU session 4 — packed fused-prefill A/B (the redesign after the
# windowed mixed step lost 121.8 vs 290.8 in session 1), serve_mixed
# cohabitation first-measure, edit euler-30 re-measure.
#   1. on-chip tier opener (includes the packed-path kernels).
#   2. legacy dense baseline in the same window.
#   3. packed fused dense @32/@96; paged fused @96.
#   4. serve_mixed (dpm-24): serving + resident image stack, one chip.
#   5. edit euler-30 re-measure (9.87 vs 6.54 s window variance).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_r4_session4.log
: > "$LOG"
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $*" >> "$LOG"
}
run 1500 python -m pytest tests/ -q -m tpu
run 900 python bench.py --metric serve_continuous --fused off --requests 32 --repeats 1
run 900 python bench.py --metric serve_continuous --fused on --requests 32 --repeats 1
run 900 python bench.py --metric serve_continuous --fused on --requests 96 --repeats 1
run 1200 python bench.py --metric serve_continuous --paged --fused on --requests 96 --repeats 1
run 1500 python bench.py --metric serve_mixed --solver dpmpp_2m --repeats 1
run 1200 python bench.py --metric e2e_edit --repeats 1
echo "ALL DONE $(date)" >> "$LOG"
