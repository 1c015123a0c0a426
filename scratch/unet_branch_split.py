"""UNet eval time: CFG-2 (internal batch 2) vs single branch (batch 1).

The v5e-8 projection splits the two CFG branches over the mesh's data=2
axis; each 4-chip group then sees a batch-1 UNet eval.  This measures the
batch-1/batch-2 ratio on the real chip (it is NOT 0.5 — small-batch
launches lose MXU efficiency), the input the PARITY.md derivation needs.
"""
import time

import jax
import jax.numpy as jnp
from flax import linen as nn

from seedx_tpu.models.sdxl.unet import UNet2DCondition, sdxl_base_unet

cfg = sdxl_base_unet(param_dtype=jnp.bfloat16)
unet = UNet2DCondition(cfg)
h = w = 128
ctx1 = jax.random.normal(jax.random.PRNGKey(1), (1, 64,
                         cfg.cross_attention_dim), jnp.bfloat16)
pooled1 = jax.random.normal(jax.random.PRNGKey(2), (1, 1280), jnp.bfloat16)
tids1 = jnp.ones((1, 6), jnp.bfloat16)
params = nn.meta.unbox(jax.jit(lambda: unet.init(
    jax.random.PRNGKey(0), jnp.zeros((1, h, w, 4), jnp.bfloat16),
    jnp.array([1.0]), ctx1, pooled1, tids1))()["params"])
jax.block_until_ready(params)


def measure(b, reps=6):
    lat = jax.random.normal(jax.random.PRNGKey(3), (b, h, w, 4), jnp.bfloat16)
    ctx = jnp.broadcast_to(ctx1, (b, *ctx1.shape[1:]))
    pooled = jnp.broadcast_to(pooled1, (b, 1280))
    tids = jnp.broadcast_to(tids1, (b, 6))
    t_vec = jnp.ones((b,), jnp.bfloat16)

    @jax.jit
    def run(p, l, shift):
        return jnp.sum(unet.apply({"params": p}, l + shift, t_vec, ctx,
                                  pooled, tids).astype(jnp.float32))

    float(run(params, lat, jnp.bfloat16(0)))
    best = 1e9
    for r in range(reps):
        t0 = time.perf_counter()
        acc = run(params, lat, jnp.bfloat16(r + 1))
        float(acc)
        best = min(best, time.perf_counter() - t0)
    print(f"b={b}: best {best*1e3:.1f} ms/eval", flush=True)
    return best


b1 = measure(1)
b2 = measure(2)
b1b = measure(1)
print(f"ratio b1/b2 = {min(b1, b1b)/b2:.3f}")
