#!/bin/bash
# Session-6 TPU queue: per-phase attribution of the resident turn
# (bench.py --phases, added this session) for euler-30 and dpm-24.
# Waits for session-5 to drain first (one TPU process at a time).
cd /root/repo
LOG=/tmp/tpu_r3_session6.log
: > "$LOG"
while ! grep -q "ALL DONE" /tmp/tpu_r3_session5.log 2>/dev/null; do sleep 30; done
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $*" >> "$LOG"
}
run python bench.py --metric e2e_resident --phases
run python bench.py --metric e2e_resident --solver dpmpp_2m --steps 24 --phases
echo "ALL DONE $(date)" >> "$LOG"
