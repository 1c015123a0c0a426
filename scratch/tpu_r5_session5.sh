#!/bin/bash
# Round-5 TPU session 5 (fresh VM — sessions 2-4 logs were lost with /tmp;
# PARITY already records session-1's fused A/B + serve_mixed).  Remaining
# measurement debt, in priority order:
#   1. on-chip tier opener (kernel health for this window).
#   2. e2e_edit re-measure (6.54 vs 9.87 window variance; dpm-24 5.38 s
#      vs the <5 s north star).
#   3. edit CFG batch-scaling study (VERDICT r4 item 3 — packing slack?).
#   4. adaptive spec-decode workloads with the INTERLEAVED A/B
#      (session-2's sequential numbers were window-poisoned).
#   5. v5e-8 train AOT certification, attn=xla, both layouts (VERDICT r4
#      item 2; deviceless TPU-compiler runs, serialized with chip jobs).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_r5_session5.log
: > "$LOG"
echo $$ > /tmp/r5s5.pid
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $*" >> "$LOG"
}
run 1500 python -m pytest tests/ -q -m tpu
run 1800 python bench.py --metric e2e_edit --repeats 1
run 1800 python scratch/edit_branch_cost.py
run 1800 python bench.py --metric spec_workload --workload doc_qa
run 1800 python bench.py --metric spec_workload --workload grounding
run 1800 python bench.py --metric spec_workload --workload story
run 5400 python scratch/v5e8_train_aot.py --one
run 5400 python scratch/v5e8_train_aot.py --tp
echo "ALL DONE $(date)" >> "$LOG"
