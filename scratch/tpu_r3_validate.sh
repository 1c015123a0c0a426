#!/bin/bash
# Round-3 TPU validation queue (VERDICT r2 items 2, 3, 8).
# Serializes every TPU job (one process at a time), logs to
# /tmp/tpu_r3_validate.log, keeps going past individual failures.
cd /root/repo
LOG=/tmp/tpu_r3_validate.log
: > "$LOG"
run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout 1800 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $*" >> "$LOG"
}

# 0. tunnel sanity
run python -c "import jax, jax.numpy as jnp; print(jax.devices()); print(float(jnp.ones((4,4)).sum()))"

# 1. Mosaic-compile + exactness of the ragged decode kernel on the REAL chip
run python -m pytest tests/test_decode_attention.py -x -q

# 2. ragged-vs-xla A/B, batched serving shape (B=8, int4+int8KV)
run python bench.py --metric decode_13b --batch 8 --decode-attn never --repeats 1
run python bench.py --metric decode_13b --batch 8 --repeats 1
# 3. B=1 int4 A/B (stacked loop; window 128-256 of 1280 -> big ragged win)
run python bench.py --metric decode_13b --quant int4 --decode-attn never --repeats 1
run python bench.py --metric decode_13b --quant int4 --repeats 1
# 4. speculative rounds/sec at k=4 (expect ~= plain B=1 tok/s)
run python bench.py --metric decode_13b --quant int4 --spec-k 4 --repeats 1
# 5. continuous serving A/B, dense 8-slot
run python bench.py --metric serve_continuous --decode-attn never --repeats 1
run python bench.py --metric serve_continuous --repeats 1
# 6. continuous serving, paged 16-slot in 8 slots' memory
run python bench.py --metric serve_continuous --paged --repeats 1

# 7. RESIDENT e2e at the deployable config (VERDICT item 3): all families
#    in HBM, euler-30 and dpmpp_2m-15, measured raw in one process each
run python bench.py --metric e2e_resident --repeats 1
run python bench.py --metric e2e_resident --solver dpmpp_2m --repeats 1

# 8. headline refresh (split-process e2e_turn, same session => same gauge)
run python bench.py --repeats 1

echo "ALL DONE $(date)" >> "$LOG"
