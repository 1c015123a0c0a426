#!/bin/bash
# Round-5 TPU session 3 — runs AFTER session 2 (waits on its pid file):
#   1. edit CFG batch-scaling study (VERDICT r4 item 3 — is the x3 batch
#      linear, i.e. are single-chip levers exhausted?)
#   2. v5e-8 train AOT certification, attn=xla, both layouts one process
#      at a time (VERDICT r4 item 2; deviceless TPU-compiler run, must be
#      serialized with chip jobs — plugin processes deadlock each other).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_r5_session3.log
: > "$LOG"
if [ -f /tmp/r5s2.pid ]; then
  while kill -0 "$(cat /tmp/r5s2.pid)" 2>/dev/null; do sleep 20; done
fi
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $*" >> "$LOG"
}
run 1800 python scratch/edit_branch_cost.py
run 5400 python scratch/v5e8_train_aot.py --one
run 5400 python scratch/v5e8_train_aot.py --tp
echo "ALL DONE $(date)" >> "$LOG"
