#!/bin/bash
# Resume of tpu_r3_diagnose.sh (steps A + B1 already done, see
# /tmp/tpu_r3_diagnose.log: ragged smoke PASS, bf16 e30 6.37 steps/s).
cd /root/repo
LOG=/tmp/tpu_r3_diagnose2.log
: > "$LOG"
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 1800 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $*" >> "$LOG"
}

# B. UNet quantization per-step cost A/B (resident turn is denoise-bound)
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
