#!/bin/bash
# Round-4 TPU session 2 — resume of the interrupted session-1 queue.
#   1. edit-turn resident bench (VERDICT item 2): euler-30 + dpm-24 +
#      one phase-split run (cond VAE encode + 8ch UNet 3-way CFG).
#   2. v5e-8 full-geometry train AOT certification (VERDICT item 5):
#      the deviceless-topology compile takes >50 min per layout — the
#      earlier attempts died to a 3000 s timeout; give each layout 4 h.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_r4_session2.log
: > "$LOG"
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $*" >> "$LOG"
}
run 3600 python bench.py --metric e2e_edit --repeats 1
run 3600 python bench.py --metric e2e_edit --solver dpmpp_2m --steps 24 --repeats 1
run 3600 python bench.py --metric e2e_edit --phases --repeats 1
run 14400 python scratch/v5e8_train_aot.py --one
run 14400 python scratch/v5e8_train_aot.py --tp
echo "ALL DONE $(date)" >> "$LOG"
