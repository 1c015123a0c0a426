#!/bin/bash
# Resident-turn re-measurement (diagnose2's e2e_resident retry: the first
# attempt died to a remote-compile helper SIGKILL, infra not repo).
# Goal: one window, euler-30 vs dpm-15 vs dpm-24 resident + a profile of
# the euler case (NOTES_r3 open item 1: 247 ms/step resident vs 155
# standalone; the session-1 dpm-15 "2.66 s" is physically implausible
# given dpm-15 standalone measured 182 ms/step today).
cd /root/repo
LOG=/tmp/tpu_r3_resident.log
: > "$LOG"
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $*" >> "$LOG"
}
run python bench.py --metric e2e_resident --repeats 1
run python bench.py --metric e2e_resident --solver dpmpp_2m --repeats 1
run python bench.py --metric e2e_resident --solver dpmpp_2m --steps 24 --repeats 1
run python bench.py --metric e2e_resident --repeats 1 --profile /tmp/prof_resident
echo "ALL DONE $(date)" >> "$LOG"
