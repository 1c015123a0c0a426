#!/bin/bash
# Round-4 TPU session 3 — packed fused-prefill A/B (VERDICT item 1).
# The windowed mixed step measured 121.8 tok/s fused vs 290.8 legacy
# (session 1): every decode-only row dragged w-1 garbage window slots
# through the projections/MLP.  The PACKED step (decode_layers_packed)
# carries slots + w real tokens instead; this session measures it.
#   1. on-chip tier opener (now includes the packed-path kernels).
#   2. legacy baseline re-measure in the same window.
#   3. packed fused dense @32/@96, width sweep, paged fused @96.
#   4. edit-turn euler-30 re-measure (9.87 vs 6.54 s window variance).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_r4_session3.log
: > "$LOG"
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $*" >> "$LOG"
}
run 1200 python -m pytest tests/ -q -m tpu
run 900 python bench.py --metric serve_continuous --fused off --requests 32 --repeats 1
run 900 python bench.py --metric serve_continuous --fused on --requests 32 --repeats 1
run 900 python bench.py --metric serve_continuous --fused on --requests 96 --repeats 1
run 900 python bench.py --metric serve_continuous --fused on --prefill-width 16 --requests 32 --repeats 1
run 1200 python bench.py --metric serve_continuous --paged --fused on --requests 96 --repeats 1
run 1200 python bench.py --metric serve_continuous --paged --fused off --requests 96 --repeats 1
run 1800 python bench.py --metric e2e_edit --repeats 1
echo "ALL DONE $(date)" >> "$LOG"
