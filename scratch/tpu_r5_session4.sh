#!/bin/bash
# Round-5 TPU session 4 — runs AFTER session 3 (waits on its pid file):
# re-measure the spec workloads with the INTERLEAVED A/B (the session-2
# runs timed plain/adaptive/always sequentially on a window-drifting chip
# — plain read 8.7 tok/s vs the historical 82, poisoning the ratios).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_r5_session4.log
: > "$LOG"
if [ -f /tmp/r5s3.pid ]; then
  while kill -0 "$(cat /tmp/r5s3.pid)" 2>/dev/null; do sleep 20; done
fi
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $*" >> "$LOG"
}
run 1800 python bench.py --metric spec_workload --workload doc_qa
run 1800 python bench.py --metric spec_workload --workload grounding
run 1800 python bench.py --metric spec_workload --workload story
echo "ALL DONE $(date)" >> "$LOG"
