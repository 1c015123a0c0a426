"""Scratch: image-space solver accuracy for the EDIT ODE (3-way CFG).

Round-3 validated dpm-24 >= euler-30 for the t2i ODE (2-way CFG,
scratch/solver_image_space.py -> tests/test_image_metrics.py).  The edit
turn misses the <5 s north star at dpm-24 (5.38 s measured, r4 session 2),
so this study asks the same shared-ODE question for the EDIT probability
flow: the 3-way InstructPix2Pix CFG combination (text/image/uncond, the
condition image channel-concat into an 8-ch conv_in) defines a DIFFERENT
eps field than t2i — image conditioning anchors the trajectory, so the ODE
may be smoother and need fewer solver steps for the same image-space
accuracy.

Framing identical to the r3 study: every run uses the Karras sigma family
(same sigma_max -> same init latents per key), so euler-200-karras is the
ground truth of the SAME ODE; candidates are VAE-decoded and scored in
PSNR/SSIM against it.  The production parity config (euler-30, leading
grid) is ALSO scored vs that truth as the quality bar (exactly how r3
justified dpm-24 for t2i).

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scratch/edit_solver_study.py
"""
import jax
import jax.numpy as jnp
import numpy as np

from seedx_tpu.models.sdxl.pipeline import (SamplerConfig, default_time_ids,
                                            denoise_edit, prepare_latents)
from seedx_tpu.models.sdxl.scheduler import make_schedule
from seedx_tpu.models.sdxl.unet import UNet2DCondition, sdxl_debug_unet
from seedx_tpu.models.sdxl.vae import VAEDecoder, vae_debug
from seedx_tpu.utils.image_metrics import psnr, ssim

ucfg = sdxl_debug_unet(in_channels=8)   # edit conv_in (latents + condition)
unet = UNet2DCondition(ucfg)
b, hw = 1, 16
ctx = jax.random.normal(jax.random.PRNGKey(1), (b, 4, ucfg.cross_attention_dim))
neg = jnp.zeros_like(ctx)
pooled = jax.random.normal(jax.random.PRNGKey(2), (b, 64))
tids = default_time_ids(SamplerConfig(), b)
params = unet.init(jax.random.PRNGKey(0), jnp.zeros((b, hw, hw, 8)),
                   jnp.array([1.0]), ctx, pooled, tids)["params"]

vcfg = vae_debug()
vae = VAEDecoder(vcfg)
vae_params = vae.init(jax.random.PRNGKey(5), jnp.zeros((b, hw, hw, 4)))["params"]

# condition-image latents: a fixed draw standing in for VAEEncoder.mode()
# of the edit's condition image (scale matches unit-normal latents)
img_lat = jax.random.normal(jax.random.PRNGKey(9), (b, hw, hw, 4))

for seed in (3, 11, 42, 7, 19, 77):
    def run_s(solver, steps, karras=None, seed=seed):
        scfg = SamplerConfig(height=hw * 8, width=hw * 8,
                             num_inference_steps=steps, solver=solver)
        schedule = make_schedule(steps, solver=solver, karras=karras)
        latents = prepare_latents(jax.random.PRNGKey(seed), b, scfg, schedule)
        lat = denoise_edit(unet, params, schedule, latents, img_lat, ctx,
                           neg, pooled, pooled * 0, tids)
        img = vae.apply({"params": vae_params}, lat / vcfg.scaling_factor)
        return np.clip(np.asarray(img, np.float32)[0], 0, 1)

    truth = run_s("euler", 200, karras=True)
    for name, img in [("euler_k15", run_s("euler", 15, karras=True)),
                      ("euler_k30", run_s("euler", 30, karras=True)),
                      ("dpm16", run_s("dpmpp_2m", 16)),
                      ("dpm18", run_s("dpmpp_2m", 18)),
                      ("dpm20", run_s("dpmpp_2m", 20)),
                      ("dpm22", run_s("dpmpp_2m", 22)),
                      ("dpm24", run_s("dpmpp_2m", 24))]:
        print(f"seed{seed} {name}: psnr={psnr(truth, img):.2f} "
              f"ssim={ssim(truth, img):.4f}", flush=True)
