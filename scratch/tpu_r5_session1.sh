#!/bin/bash
# Round-5 TPU session 1 — the round-4 measurement debt (VERDICT r4 items
# 1, 4, 5-adjacent, 6):
#   1. on-chip tier opener (validates packed-path kernels on the chip).
#   2. legacy dense baseline (fused off) in the same window.
#   3. packed fused dense @32/@96 + width-16 variant.
#   4. paged fused on/off @96 (close-or-bound the paged gap).
#   5. serve_mixed (dpm-24): serving + resident image stack, one chip.
#   6. edit euler-30/dpm-24 re-measure (9.87 vs 6.54 s window variance).
# Results feed the fused-prefill default decision
# (inference/continuous.py) and PARITY rows.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_r5_session1.log
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
run 900 python bench.py --metric serve_continuous --fused on --prefill-width 16 --requests 32 --repeats 1
run 1200 python bench.py --metric serve_continuous --paged --fused on --requests 96 --repeats 1
run 1200 python bench.py --metric serve_continuous --paged --fused off --requests 96 --repeats 1
run 1500 python bench.py --metric serve_mixed --solver dpmpp_2m --repeats 1
run 1800 python bench.py --metric e2e_edit --repeats 1
# 7. adaptive spec-decode gate MEASURED on chip (VERDICT r4 item 5):
#    best case (doc_qa quoting), a markup case (grounding), and the
#    bounded-loss case (story) — plain vs adaptive vs always-on.
run 1200 python bench.py --metric spec_workload --workload doc_qa
run 1200 python bench.py --metric spec_workload --workload grounding
run 1200 python bench.py --metric spec_workload --workload story
echo "ALL DONE $(date)" >> "$LOG"
