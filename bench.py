"""Benchmark driver entry — prints ONE JSON line.

Round-1 headline metric: ViT-bigG/14 448px encode throughput (images/sec) on
one real chip — the first of the three BASELINE.json metrics ("images/sec ViT
encode; tokens/sec/chip 13B decode; SDXL denoise steps/sec").  The reference
publishes no numbers (BASELINE.md), so ``vs_baseline`` is null: the value is
the baseline being established.

Full flagship geometry: width 1664, 48 layers, mlp 8192, 1024 tokens,
attention-pool to 256 queries @ 4096 (configs/visual_encoder/qwen_vitg_448.yaml),
bf16, remat off (inference).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def bench_vit_encode(batch_size: int = 16, iters: int = 10, warmup: int = 2):
    from seedx_tpu.models.vit import VisionTransformer, qwen_vitg_448

    cfg = qwen_vitg_448(param_dtype=jnp.bfloat16)
    model = VisionTransformer(cfg, remat=False)

    images = jax.random.normal(
        jax.random.PRNGKey(0),
        (batch_size, cfg.image_size, cfg.image_size, 3), jnp.bfloat16)

    init_rng = jax.random.PRNGKey(0)
    variables = jax.jit(lambda r: model.init(r, images[:1]))(init_rng)

    # Each call reduces to a scalar; the final python float() forces full
    # materialisation.  (On the tunnelled TPU backend block_until_ready
    # returns before execution completes, so timing MUST be closed by a
    # host transfer that depends on every iteration.)  ``shift``/``carry``
    # are traced args: one compile, every iteration distinct + serially
    # dependent, so no caching layer can dedupe executions.
    @jax.jit
    def encode(variables, images, shift, carry):
        out = model.apply(variables, images + shift + 0.0 * carry)
        return jnp.sum(out.astype(jnp.float32))

    acc = jnp.float32(0.0)
    for i in range(warmup):
        acc = encode(variables, images, jnp.float32(i), acc)
    float(acc)

    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for i in range(iters):
        acc = encode(variables, images, jnp.float32(i), acc)
    float(acc)
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def main():
    value = bench_vit_encode()
    print(json.dumps({
        "metric": "vit_bigG_448_encode",
        "value": round(value, 2),
        "unit": "images/sec",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
