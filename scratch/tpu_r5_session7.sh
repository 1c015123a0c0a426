#!/bin/bash
# Round-5 TPU session 7 — spec workloads with the gate-SEGMENTED decode
# loop (commit 4a5a502; session 6 measured the chunk fix only, leaving the
# adaptive arm capped by the per-step gate cond: grounding adaptive read
# 12.1 tok/s vs plain 70.8).  Then the v5e-8 train AOT certs.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_r5_session7.log
: > "$LOG"
echo $$ > /tmp/r5s7.pid
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $*" >> "$LOG"
}
run 1800 python bench.py --metric spec_workload --workload doc_qa
run 1800 python bench.py --metric spec_workload --workload grounding
run 1800 python bench.py --metric spec_workload --workload story
# interleaved same-process gi=1.5 vs gi=1.0 edit A/B (the session-6
# cross-process readings disagreed with the same-process branch-cost
# study: 5.34 gi1.5 vs 7.12 gi1.0 across processes, B2/B3=0.70 within)
run 2400 python bench.py --metric e2e_edit --solver dpmpp_2m --image-cfg-ab
run 5400 python scratch/v5e8_train_aot.py --one
run 5400 python scratch/v5e8_train_aot.py --tp
echo "ALL DONE $(date)" >> "$LOG"
