#!/bin/bash
# Round-5 TPU session 2 — finish session 1's interrupted tail (the prior
# driver process died at the e2e_edit step) with the fused-prefill
# default now OFF (the session-1 A/B: dense legacy 293.6 vs packed fused
# 114-119 tok/s; paged 241.6 vs 86.9):
#   1. serve_mixed RE-measure — session 1 ran it with the old fused-ON
#      default (serve_alone was 115.8 tok/s, the fused signature).
#   2. e2e_edit re-measure (9.87 vs 6.54 s window variance from r4).
#   3. adaptive spec-decode gate measured on chip (VERDICT r4 item 5):
#      doc_qa (best case), grounding (markup), story (bounded loss).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_r5_session2.log
: > "$LOG"
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $*" >> "$LOG"
}
run 1500 python bench.py --metric serve_mixed --solver dpmpp_2m --repeats 1
run 1800 python bench.py --metric e2e_edit --repeats 1
run 1500 python bench.py --metric spec_workload --workload doc_qa
run 1200 python bench.py --metric spec_workload --workload grounding
run 1200 python bench.py --metric spec_workload --workload story
echo "ALL DONE $(date)" >> "$LOG"
