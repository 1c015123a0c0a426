#!/bin/bash
# Round-5 TPU session 6 — after the session-5 chip-timing steps (session 5
# was stopped at its AOT tail so the chip window stays contiguous):
#   1. plainloop probe: quantify the while-loop chunk-branch penalty on
#      chip (pre-fix plain arm read 9-19 tok/s vs 82 historical) and the
#      nested-loop fix's recovery (scan vs while A/B at 13B int4).
#   2. spec workloads RE-measured with the fixed engine (the session-5
#      numbers were depressed by the same loop bug in the plain+adaptive
#      arms; acceptance counters matched the CPU replays exactly).
#   3. fresh-window dpm-24 edit baseline + the gi=1.0 CFG-collapse fast
#      path (x2 UNet batch) at dpm-24 and euler-30.
#   4. v5e-8 train AOT certification, attn=xla, both layouts (VERDICT r4
#      item 2) — deviceless TPU-compiler runs, serialized after chip work.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_r5_session6.log
: > "$LOG"
echo $$ > /tmp/r5s6.pid
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $*" >> "$LOG"
}
run 1800 python scratch/plainloop_probe.py
run 1800 python bench.py --metric spec_workload --workload doc_qa
run 1800 python bench.py --metric spec_workload --workload grounding
run 1800 python bench.py --metric spec_workload --workload story
run 1800 python bench.py --metric e2e_edit --solver dpmpp_2m --repeats 1
run 1800 python bench.py --metric e2e_edit --solver dpmpp_2m --image-cfg 1.0 --repeats 1
run 1800 python bench.py --metric e2e_edit --image-cfg 1.0 --repeats 1
run 5400 python scratch/v5e8_train_aot.py --one
run 5400 python scratch/v5e8_train_aot.py --tp
echo "ALL DONE $(date)" >> "$LOG"
