#!/bin/bash
# Round-4 TPU session 1 — the VERDICT r3 measurement queue.
#   1. on-chip Mosaic tier (pytest -m tpu) — the new standard opener
#      (VERDICT item 3): non-interpret flash fwd/bwd, int4 stacked matmul,
#      ragged decode attention dense/paged/multi-query, int8 KV.
#   2. fused-prefill serving A/B (VERDICT item 1): dense fused vs legacy
#      at the r3 workload (8 slots, 32 requests; r3 legacy = 261.7 tok/s),
#      then paged fused vs dense at MATCHED queue depth.
#   3. edit-turn resident bench (VERDICT item 2): euler-30 + dpm-24,
#      cond VAE encode + 8ch UNet 3-way CFG.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_r4_session1.log
: > "$LOG"
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 3000 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $*" >> "$LOG"
}
run python -c "import bench; print('gauge_tflops', bench.chip_gauge()); print('hbm_gbps', bench.hbm_gauge())"
run python -m pytest tests/ -q -m tpu
run python bench.py --metric serve_continuous --fused off --requests 32 --repeats 1
run python bench.py --metric serve_continuous --fused on --requests 32 --repeats 1
run python bench.py --metric serve_continuous --fused on --requests 96 --repeats 1
run python bench.py --metric serve_continuous --paged --fused on --requests 96 --repeats 1
run python bench.py --metric serve_continuous --fused on --prefill-width 16 --requests 32 --repeats 1
run python bench.py --metric e2e_edit --repeats 1
run python bench.py --metric e2e_edit --solver dpmpp_2m --steps 24 --repeats 1
echo "ALL DONE $(date)" >> "$LOG"
