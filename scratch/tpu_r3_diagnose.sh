#!/bin/bash
# Round-3 follow-up TPU diagnostics (after tpu_r3_validate.sh):
#  A. on-chip ragged-kernel parity smoke (non-interpret Mosaic numerics)
#  B. resident-vs-split 3.5s delta: int8 UNet per-step cost A/B
#  C. B=1 auto heuristic regression check (ragged should now be OFF at B=1)
#  D. paged serving slowdown: pool-pressure A/B + profile trace
cd /root/repo
LOG=/tmp/tpu_r3_diagnose.log
: > "$LOG"
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 1800 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $*" >> "$LOG"
}

# A. real Mosaic compile + numerics of the ragged kernel
run python scratch/tpu_ragged_smoke.py

# B. UNet quantization per-step cost (the resident turn spends ~all its
#    time in denoise; int8 was never A/B'd on chip).  Resident euler-30
#    implies 247ms/step int8 vs 133ms/step split-process bf16, yet
#    resident dpm-15 implies 140ms/step — A/B all combos.
run python bench.py --metric sdxl_denoise --steps 30 --repeats 1
run python bench.py --metric sdxl_denoise --steps 30 --unet-quant int8 --repeats 1
run python bench.py --metric sdxl_denoise --steps 15 --solver dpmpp_2m --unet-quant int8 --repeats 1
run python bench.py --metric e2e_resident --repeats 1

# C. B=1 int4 decode with the new auto>=2 cutoff (expect ~82 tok/s again)
run python bench.py --metric decode_13b --quant int4 --repeats 1

# D1. paged with a pressure-free pool (16 slots fully resident)
run python bench.py --metric serve_continuous --paged --pool-tokens 6144 --repeats 1
# D2. paged at 8 slots (isolate per-step paged cost from slot count)
run python bench.py --metric serve_continuous --paged --slots 8 --pool-tokens 3584 --repeats 1
# D3. profile the default paged run
run python bench.py --metric serve_continuous --paged --repeats 1 --profile /tmp/prof_paged
# D4. dense profile for comparison
run python bench.py --metric serve_continuous --repeats 1 --profile /tmp/prof_dense

echo "ALL DONE $(date)" >> "$LOG"
