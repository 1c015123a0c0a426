#!/bin/bash
# Round-5 TPU session 6 — runs after session 5's chip-timing steps
# (launched manually once session 5 is stopped ahead of its AOT tail, or
# after it exits):
#   1. e2e_edit with the gi=1.0 CFG-collapse fast path (x2 UNet batch) —
#      quantifies the new opt-in lever at dpm-24 and euler-30.
#   2. v5e-8 train AOT certification, attn=xla, both layouts (VERDICT r4
#      item 2) — deviceless TPU-compiler runs, serialized with chip jobs.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_r5_session6.log
: > "$LOG"
echo $$ > /tmp/r5s6.pid
if [ -f /tmp/r5s5.pid ]; then
  while kill -0 "$(cat /tmp/r5s5.pid)" 2>/dev/null; do sleep 20; done
fi
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $*" >> "$LOG"
}
run 1800 python bench.py --metric e2e_edit --solver dpmpp_2m --repeats 1
run 1800 python bench.py --metric e2e_edit --solver dpmpp_2m --image-cfg 1.0 --repeats 1
run 1800 python bench.py --metric e2e_edit --image-cfg 1.0 --repeats 1
run 5400 python scratch/v5e8_train_aot.py --one
run 5400 python scratch/v5e8_train_aot.py --tp
echo "ALL DONE $(date)" >> "$LOG"
