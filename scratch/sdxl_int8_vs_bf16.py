"""Same-process SDXL denoise: bf16 weights vs int8 weight-only, real chip.

The tunnelled chip's throughput is time-varying, so the only trustworthy
comparison is interleaved in one process.  Params are random and
materialized ON DEVICE (eval_shape + fill) — pulling the 5.2 GB fp tree
to host for real quantization takes minutes over the tunnel and perf does
not depend on weight values.
"""
import time

import jax
import jax.numpy as jnp
from flax import linen as nn

from seedx_tpu.models.sdxl.pipeline import (SamplerConfig, default_time_ids,
                                            denoise_text2image,
                                            prepare_latents)
from seedx_tpu.models.sdxl.scheduler import make_schedule
from seedx_tpu.models.sdxl.unet import UNet2DCondition, sdxl_base_unet

steps, batch = 10, 1
scfg = SamplerConfig(height=1024, width=1024, num_inference_steps=steps)
schedule = make_schedule(steps)
h, w = scfg.latent_hw
sample = jnp.zeros((batch, h, w, 4), jnp.bfloat16)

ctx = jax.random.normal(jax.random.PRNGKey(1), (batch, 64, 2048),
                        jnp.bfloat16)
pooled = jax.random.normal(jax.random.PRNGKey(2), (batch, 1280), jnp.bfloat16)


def fill(path, x):
    key = jax.random.PRNGKey(hash(str(path)) % (2 ** 31))
    if x.dtype == jnp.int8:
        return jax.random.randint(key, x.shape, -127, 128, jnp.int32
                                  ).astype(jnp.int8)
    return (jax.random.normal(key, x.shape, jnp.float32) * 0.02
            ).astype(x.dtype)


def build(quantize):
    cfg = sdxl_base_unet(param_dtype=jnp.bfloat16, quantize=quantize)
    unet = UNet2DCondition(cfg)
    tids = default_time_ids(scfg, batch)
    shapes = nn.meta.unbox(jax.eval_shape(lambda: unet.init(
        jax.random.PRNGKey(0), sample, jnp.array([1.0]), ctx, pooled,
        tids)))["params"]
    params = jax.jit(
        lambda: jax.tree_util.tree_map_with_path(fill, shapes))()
    jax.block_until_ready(params)

    @jax.jit
    def run(p, latents, shift):
        out = denoise_text2image(unet, p, schedule, latents + shift, ctx,
                                 ctx * 0, pooled, pooled * 0, tids)
        return jnp.sum(out.astype(jnp.float32))

    return params, run


latents = prepare_latents(jax.random.PRNGKey(3), batch, scfg, schedule,
                          jnp.bfloat16)


def measure(name, params, run, reps=3):
    t0 = time.perf_counter()
    float(run(params, latents, jnp.bfloat16(0)))
    print(f"{name} compile+first: {time.perf_counter()-t0:.0f} s",
          flush=True)
    best = 0.0
    for r in range(reps):
        t0 = time.perf_counter()
        float(run(params, latents, jnp.bfloat16(r + 1)))
        dt = time.perf_counter() - t0
        best = max(best, steps / dt)
        print(f"{name} rep{r}: {steps/dt:.2f} steps/s", flush=True)
    return best


qp, qrun = build("int8")
qb = measure("int8", qp, qrun)
del qp
fp, frun = build("none")
fb = measure("bf16", fp, frun)
qp, qrun = build("int8")
qb2 = measure("int8-again", qp, qrun)
print(f"best: int8 {max(qb, qb2):.2f} vs bf16 {fb:.2f} steps/s")
