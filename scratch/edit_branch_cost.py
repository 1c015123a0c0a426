"""Edit-turn CFG batch-scaling study (VERDICT r4 next-item 3).

The SEED-X-Edit turn pays a x3 CFG batch per UNet step (InstructPix2Pix
text/image/uncond, reference pipeline_stable_diffusion_xl_t2i_edit.py:
905-937) vs x2 for t2i.  The two candidate levers for the missing 8% to
the <5 s north star are (a) sub-linear batch scaling we could exploit by
re-packing branches, (b) redundant per-branch work that a x2+reuse
schedule could share.  (b) is bounded by construction: the image and
uncond branches share the NEGATIVE context, so the only shareable compute
is the cross-attn K/V projections of a 64-token context — O(64*2048*d)
per attn block, <0.5% of an eval's FLOPs; the latent streams diverge at
conv_in (condition channels: cond vs zeros), so everything else is
branch-specific.  This script measures (a): per-eval cost of the EDIT
UNet (8-ch conv_in, int8 weights like the resident benchmark) at CFG
batch 1/2/3/4, 1024x1024 latents, on the real chip.

If cost(B=3)/cost(B=2) ~= 1.5 the scaling is linear and the x3 batch has
no packing slack -> the honest conclusion is "exhausted levers" at the
standard of the t2i 52%-MFU ceiling study (PARITY.md), with the v5e-8
slice as the designed route.

Run (TPU, serialized with other chip jobs):
  PYTHONPATH=/root/repo:/root/.axon_site python scratch/edit_branch_cost.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from seedx_tpu.models.sdxl.unet import UNet2DCondition, sdxl_edit_unet


def main():
    cfg = sdxl_edit_unet(param_dtype=jnp.bfloat16, quantize="int8")
    unet = UNet2DCondition(cfg)
    h = w = 128                       # 1024**2 / 8 latents

    fp_unet = UNet2DCondition(sdxl_edit_unet(param_dtype=jnp.bfloat16))
    sample1 = jnp.zeros((1, h, w, cfg.in_channels), jnp.bfloat16)
    ctx1 = jnp.zeros((1, 64, cfg.cross_attention_dim), jnp.bfloat16)
    pooled1 = jnp.zeros((1, 1280), jnp.bfloat16)
    tids1 = jnp.zeros((1, 6), jnp.float32)
    params = nn.meta.unbox(jax.jit(lambda: fp_unet.init(
        jax.random.PRNGKey(0), sample1, jnp.array([1.0]), ctx1, pooled1,
        tids1))()["params"])
    jax.block_until_ready(params)

    from seedx_tpu.utils.quantize import quantize_unet_params
    params = jax.tree.map(jnp.asarray, quantize_unet_params(
        jax.tree.map(np.asarray, params)))
    jax.block_until_ready(params)

    results = {}
    for B in (1, 2, 3, 4):
        sample = jax.random.normal(jax.random.PRNGKey(1),
                                   (B, h, w, cfg.in_channels), jnp.bfloat16)
        ctx = jax.random.normal(jax.random.PRNGKey(2),
                                (B, 64, cfg.cross_attention_dim),
                                jnp.bfloat16)
        pooled = jax.random.normal(jax.random.PRNGKey(3), (B, 1280),
                                   jnp.bfloat16)
        tids = jnp.tile(jnp.array([[1024., 1024., 0., 0., 1024., 1024.]]),
                        (B, 1))

        @jax.jit
        def run(params, sample, shift):
            out = unet.apply({"params": params}, sample + shift,
                             jnp.array([4.0]), ctx, pooled, tids)
            return jnp.sum(out.astype(jnp.float32))

        float(run(params, sample, jnp.bfloat16(0)))      # compile + warm
        iters = 12
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for i in range(iters):
            acc = acc * 0 + run(params, sample,
                                acc.astype(jnp.bfloat16) * 0 + jnp.bfloat16(i))
        float(acc)                                        # host-close timing
        dt = (time.perf_counter() - t0) / iters
        results[B] = dt * 1e3
        print(f"B={B}: {dt*1e3:.1f} ms/eval", flush=True)

    r21 = results[2] / results[1]
    r32 = results[3] / results[2]
    r43 = results[4] / results[3]
    print("EDIT_BRANCH_COST", {
        "ms_per_eval": {k: round(v, 1) for k, v in results.items()},
        "B2_over_B1": round(r21, 3), "B3_over_B2": round(r32, 3),
        "B4_over_B3": round(r43, 3),
        "x3_step_ms": round(results[3], 1),
        "linear_scaling": bool(abs(r32 - 1.5) < 0.12),
    }, flush=True)


if __name__ == "__main__":
    main()
