"""Scratch: image-space 2M-vs-3M solver accuracy on the debug SDXL stack.

Same shared-ODE framing as solver_image_space.py (euler-200 Karras truth,
PSNR/SSIM of VAE-decoded outputs, 3 seeds), extended with dpmpp_3m at the
candidate step counts.  Run with the env var (NOT os.environ — the axon
plugin ignores in-process JAX_PLATFORMS):

    JAX_PLATFORMS=cpu python scratch/solver3m_image_study.py
"""
import jax
import jax.numpy as jnp
import numpy as np

from seedx_tpu.models.sdxl.pipeline import (SamplerConfig, default_time_ids,
                                            denoise_text2image,
                                            prepare_latents)
from seedx_tpu.models.sdxl.scheduler import make_schedule
from seedx_tpu.models.sdxl.unet import UNet2DCondition, sdxl_debug_unet
from seedx_tpu.models.sdxl.vae import VAEDecoder, vae_debug
from seedx_tpu.utils.image_metrics import psnr, ssim

ucfg = sdxl_debug_unet()
unet = UNet2DCondition(ucfg)
b, hw = 1, 16
ctx = jax.random.normal(jax.random.PRNGKey(1), (b, 4, ucfg.cross_attention_dim))
pooled = jax.random.normal(jax.random.PRNGKey(2), (b, 64))
tids = default_time_ids(SamplerConfig(), b)
params = unet.init(jax.random.PRNGKey(0), jnp.zeros((b, hw, hw, 4)),
                   jnp.array([1.0]), ctx, pooled, tids)["params"]
vcfg = vae_debug()
vae = VAEDecoder(vcfg)
vae_params = vae.init(jax.random.PRNGKey(5), jnp.zeros((b, hw, hw, 4)))["params"]

for seed in (3, 11, 42):
    def run_s(solver, steps, karras=None, seed=seed):
        scfg = SamplerConfig(height=hw * 8, width=hw * 8,
                             num_inference_steps=steps, solver=solver)
        schedule = make_schedule(steps, solver=solver, karras=karras)
        latents = prepare_latents(jax.random.PRNGKey(seed), b, scfg, schedule)
        lat = denoise_text2image(unet, params, schedule, latents, ctx,
                                 ctx * 0, pooled, pooled * 0, tids)
        img = vae.apply({"params": vae_params}, lat / vcfg.scaling_factor)
        return np.clip(np.asarray(img, np.float32)[0], 0, 1)

    truth = run_s("euler", 200, karras=True)
    for name, img in [("euler_k30", run_s("euler", 30, karras=True)),
                      ("dpm2m_15", run_s("dpmpp_2m", 15)),
                      ("dpm3m_15", run_s("dpmpp_3m", 15)),
                      ("dpm2m_18", run_s("dpmpp_2m", 18)),
                      ("dpm3m_18", run_s("dpmpp_3m", 18)),
                      ("dpm3m_20", run_s("dpmpp_3m", 20)),
                      ("dpm2m_24", run_s("dpmpp_2m", 24)),
                      ("dpm3m_24", run_s("dpmpp_3m", 24))]:
        print(f"seed{seed} {name}: psnr={psnr(truth, img):.2f} "
              f"ssim={ssim(truth, img):.4f}", flush=True)
print("DONE")
