"""Real-chip evidence for the v5e-8 denoise projection: measure the UNet
eval at (a) full CFG-2 batch, (b) batch 1 (one CFG branch = the data-axis
shard), and (c) batch 2 at quarter-height latents (the tensor-axis row
shard), all interleaved in ONE process so the tunnel's drift cancels.

v5e-8 plan is data=2 (CFG branches) x tensor=4 (latent rows); per-chip
compute per denoise step is (c)'s time, plus ICI time for the counted
collectives (scratch/v5e8_unet_full.py).
"""
import time

import jax
import jax.numpy as jnp
from flax import linen as nn

from seedx_tpu.models.sdxl.unet import UNet2DCondition, sdxl_base_unet

cfg = sdxl_base_unet(param_dtype=jnp.bfloat16)
unet = UNet2DCondition(cfg)


def fill(path, x):
    key = jax.random.PRNGKey(hash(str(path)) % (2 ** 31))
    return (jax.random.normal(key, x.shape, jnp.float32) * 0.02
            ).astype(x.dtype)


shapes = nn.meta.unbox(jax.eval_shape(lambda: unet.init(
    jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 4), jnp.bfloat16),
    jnp.array([1.0]), jnp.zeros((1, 64, cfg.cross_attention_dim),
                                jnp.bfloat16),
    jnp.zeros((1, 1280), jnp.bfloat16), jnp.zeros((1, 6), jnp.bfloat16),
)))["params"]
params = jax.jit(lambda: jax.tree_util.tree_map_with_path(fill, shapes))()
jax.block_until_ready(params)


def bench(name, batch, h, w, iters=20):
    lat = jax.random.normal(jax.random.PRNGKey(1), (batch, h, w, 4),
                            jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (batch, 64, 2048),
                            jnp.bfloat16)
    pooled = jax.random.normal(jax.random.PRNGKey(3), (batch, 1280),
                               jnp.bfloat16)
    tids = jnp.zeros((batch, 6), jnp.bfloat16)
    t = jnp.full((batch,), 500.0)

    @jax.jit
    def run(p, l, shift):
        def body(carry, i):
            out = unet.apply({"params": p}, carry + shift, t, ctx, pooled,
                             tids)
            return carry + out * 1e-3, None

        final, _ = jax.lax.scan(body, l, jnp.arange(iters))
        return jnp.sum(final.astype(jnp.float32))

    float(run(params, lat, jnp.bfloat16(0)))          # compile
    best = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        float(run(params, lat, jnp.bfloat16(r + 1)))
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name}: {best * 1e3:.1f} ms/eval", flush=True)
    return best


full = bench("CFG-2 full      (B=2,128x128)", 2, 128, 128)
half = bench("CFG branch      (B=1,128x128)", 1, 128, 128)
rows = bench("row shard       (B=2, 32x128)", 2, 32, 128)
both = bench("branch+row shard(B=1, 32x128)", 1, 32, 128)
print(f"data=2 speedup {full/half:.2f}x; tensor=4 row compute "
      f"{rows/full:.3f} of full; 8-way shard {both/full:.3f} of full")
