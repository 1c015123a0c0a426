#!/bin/bash
# Round-5 TPU session 9 — spec workloads with the n-gram-history fix
# (commit 7cee4fc): the adaptive gate can now recover after cooldowns,
# so grounding (whose probes previously drafted against a holey history
# and always failed) should capture most of spec-always's +40%.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_r5_session9.log
: > "$LOG"
echo $$ > /tmp/r5s9.pid
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $*" >> "$LOG"
}
run 1800 python bench.py --metric spec_workload --workload grounding
run 1800 python bench.py --metric spec_workload --workload story
run 1800 python bench.py --metric spec_workload --workload doc_qa
echo "ALL DONE $(date)" >> "$LOG"
