"""Jitted SDXL sampling: text2image and InstructPix2Pix-style editing.

Parity with the reference pipelines:
  * t2i: diffusers ``StableDiffusionXLPipeline`` driven with embeddings only
    (text encoders = None; reference: adapter_modules.py:78-86),
  * edit: ``StableDiffusionXLText2ImageAndEditPipeline`` — condition image
    VAE-encoded with ``.mode()``, channel-concat with latents, 3-way CFG
    ``uncond + g*(text - img) + g_img*(img - uncond)``
    (reference: pipeline_stable_diffusion_xl_t2i_edit.py:490-551,905-937),
  * optional guidance rescale (:90-102,939-941).

TPU-first: the whole denoise loop is ONE ``lax.scan`` inside jit (the
reference's per-step ``xm.mark_step()`` at :962 is the torch-XLA crutch this
design removes).  The reference's sigma-space CFG "hack" (:928-931,949-950)
converts eps -> x0 per branch before combining and back after; because the
CFG combination is affine with coefficients summing to 1, it commutes with
that conversion — combining in eps space is mathematically identical, so no
hack is needed here.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from seedx_tpu.models.sdxl.scheduler import (EulerSchedule, dpmpp_2m_step,
                                             dpmpp_3m_step, euler_step,
                                             scale_model_input)


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    height: int = 1024
    width: int = 1024
    num_inference_steps: int = 30          # 50 in eval scripts
    guidance_scale: float = 7.5
    image_guidance_scale: float = 1.5
    guidance_rescale: float = 0.0
    latent_channels: int = 4
    vae_scale: int = 8
    vae_scaling_factor: float = 0.13025

    solver: str = "euler"          # "euler" (parity) | "dpmpp_2m" | "dpmpp_3m"

    @property
    def latent_hw(self) -> Tuple[int, int]:
        return self.height // self.vae_scale, self.width // self.vae_scale


def _solver_scan(schedule: EulerSchedule, latents, eps_fn):
    """Run the denoise loop: one lax.scan over steps for either solver.

    ``eps_fn(lat, sigma, t) -> eps_cfg`` is the CFG-combined UNet eval; the
    solver update around it is selected statically from ``schedule.solver``
    (DPM-Solver++(2M) carries the previous step's x0 prediction).
    """
    sigmas = jnp.asarray(schedule.sigmas)
    timesteps = jnp.asarray(schedule.timesteps)
    solver = schedule.solver
    if solver in ("dpmpp_2m", "dpmpp_3m"):
        r0s = jnp.asarray(schedule.r0)
        second = jnp.asarray(schedule.second_order)
    if solver == "dpmpp_3m":
        r1s = jnp.asarray(schedule.r1)
        c1s = jnp.asarray(schedule.c1)
        c2s = jnp.asarray(schedule.c2)
        orders = jnp.asarray(schedule.order)

    def step(carry, i):
        lat, m1, m2 = carry
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        eps_cfg = eps_fn(lat, sigma, timesteps[i])
        if solver == "dpmpp_3m":
            lat, m1, m2 = dpmpp_3m_step(lat, m1, m2, eps_cfg, sigma,
                                        sigma_next, r0s[i], r1s[i],
                                        c1s[i], c2s[i], orders[i])
        elif solver == "dpmpp_2m":
            lat, m1 = dpmpp_2m_step(lat, m1, eps_cfg, sigma,
                                    sigma_next, r0s[i], second[i])
        else:
            lat = euler_step(lat, eps_cfg, sigma, sigma_next)
        return (lat, m1, m2), None

    zeros = jnp.zeros(latents.shape, jnp.float32)
    (latents, _, _), _ = jax.lax.scan(step, (latents, zeros, zeros),
                                      jnp.arange(schedule.num_steps))
    return latents


def default_time_ids(cfg: SamplerConfig, batch: int) -> jnp.ndarray:
    """[orig_h, orig_w, crop_top, crop_left, target_h, target_w]."""
    ids = jnp.array([cfg.height, cfg.width, 0, 0, cfg.height, cfg.width],
                    jnp.float32)
    return jnp.broadcast_to(ids, (batch, 6))


def rescale_noise_cfg(noise_cfg, noise_pred_text, guidance_rescale):
    """(reference: pipeline...py:90-102; arXiv:2305.08891 §3.4)"""
    axes = tuple(range(1, noise_cfg.ndim))
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True)
    rescaled = noise_cfg * (std_text / (std_cfg + 1e-12))
    return (guidance_rescale * rescaled
            + (1.0 - guidance_rescale) * noise_cfg)


def denoise_text2image(
    unet,
    unet_params: Any,
    schedule: EulerSchedule,
    latents: jnp.ndarray,                 # [B, h, w, 4] ~ N(0,1)*init_sigma
    prompt_embeds: jnp.ndarray,           # [B, T, 2048]
    negative_prompt_embeds: jnp.ndarray,
    pooled: jnp.ndarray,                  # [B, 1280]
    negative_pooled: jnp.ndarray,
    time_ids: jnp.ndarray,                # [B, 6]
    guidance_scale: float = 7.5,
    guidance_rescale: float = 0.0,
) -> jnp.ndarray:
    """2-way CFG sampling; returns final latents (unscaled)."""
    context = jnp.concatenate([negative_prompt_embeds, prompt_embeds])
    pooled_all = jnp.concatenate([negative_pooled, pooled])
    tids = jnp.concatenate([time_ids, time_ids])

    def eps_fn(lat, sigma, t):
        lat_in = jnp.concatenate([lat, lat])
        scaled = scale_model_input(lat_in, sigma)
        eps = unet.apply({"params": unet_params}, scaled,
                         jnp.broadcast_to(t, (scaled.shape[0],)),
                         context, pooled_all, tids)
        eps_uncond, eps_text = jnp.split(eps, 2)
        eps_cfg = eps_uncond + guidance_scale * (eps_text - eps_uncond)
        if guidance_rescale > 0.0:
            eps_cfg = rescale_noise_cfg(eps_cfg, eps_text, guidance_rescale)
        return eps_cfg

    return _solver_scan(schedule, latents, eps_fn)


def denoise_edit(
    unet,
    unet_params: Any,
    schedule: EulerSchedule,
    latents: jnp.ndarray,                 # [B, h, w, 4]
    image_latents: jnp.ndarray,           # [B, h, w, 4] condition (.mode())
    prompt_embeds: jnp.ndarray,
    negative_prompt_embeds: jnp.ndarray,
    pooled: jnp.ndarray,
    negative_pooled: jnp.ndarray,
    time_ids: jnp.ndarray,
    guidance_scale: float = 7.5,
    image_guidance_scale: float = 1.5,
    guidance_rescale: float = 0.0,
) -> jnp.ndarray:
    """3-way InstructPix2Pix CFG (reference: pipeline...py:905-937).

    Branch order [text, image, uncond]; the TEXT branch alone gets the
    prompt — the image branch pairs the NEGATIVE prompt with the condition
    image (reference :883-885: ``cat([prompt, negative, negative])``, "the
    extra concat similar to how it's done in SD InstructPix2Pix"), so
    ``text - image`` isolates the prompt's effect at fixed image
    conditioning.  Condition latents are channel-concat (text & image
    branches get the condition, uncond gets zeros — reference
    prepare_image_latents :537-546).

    Fast path: at ``image_guidance_scale == 1.0`` the combination is
    algebraically independent of the uncond branch —
    ``u + g*(t - i) + 1.0*(i - u) = i + g*(t - i)`` — so the uncond UNet
    eval (whose output cancels exactly) is dropped and each step runs a
    x2 batch instead of x3 (the reference runs all three regardless,
    :905-937).  ``image_guidance_scale`` is a static python float, so the
    choice is made at trace time; outputs match the 3-branch path to
    float rounding (tests/test_sdxl.py::test_edit_cfg_collapse_matches_
    three_branch).
    """
    collapse = float(image_guidance_scale) == 1.0
    if collapse:
        context = jnp.concatenate([prompt_embeds, negative_prompt_embeds])
        pooled_all = jnp.concatenate([pooled, negative_pooled])
        tids = jnp.concatenate([time_ids] * 2)
        cond = jnp.concatenate([image_latents, image_latents])
    else:
        context = jnp.concatenate([prompt_embeds, negative_prompt_embeds,
                                   negative_prompt_embeds])
        pooled_all = jnp.concatenate([pooled, negative_pooled,
                                      negative_pooled])
        tids = jnp.concatenate([time_ids] * 3)
        cond = jnp.concatenate(
            [image_latents, image_latents, jnp.zeros_like(image_latents)])

    def eps_fn(lat, sigma, t):
        lat_in = jnp.concatenate([lat] * (2 if collapse else 3))
        scaled = scale_model_input(lat_in, sigma)
        scaled = jnp.concatenate([scaled, cond.astype(scaled.dtype)], axis=-1)
        eps = unet.apply({"params": unet_params}, scaled,
                         jnp.broadcast_to(t, (scaled.shape[0],)),
                         context, pooled_all, tids)
        if collapse:
            eps_text, eps_image = jnp.split(eps, 2)
            eps_cfg = eps_image + guidance_scale * (eps_text - eps_image)
        else:
            eps_text, eps_image, eps_uncond = jnp.split(eps, 3)
            eps_cfg = (eps_uncond
                       + guidance_scale * (eps_text - eps_image)
                       + image_guidance_scale * (eps_image - eps_uncond))
        if guidance_rescale > 0.0:
            eps_cfg = rescale_noise_cfg(eps_cfg, eps_text, guidance_rescale)
        return eps_cfg

    return _solver_scan(schedule, latents, eps_fn)


def prepare_latents(rng, batch: int, cfg: SamplerConfig,
                    schedule: EulerSchedule, dtype=jnp.float32) -> jnp.ndarray:
    h, w = cfg.latent_hw
    noise = jax.random.normal(rng, (batch, h, w, cfg.latent_channels), dtype)
    return noise * schedule.init_noise_sigma


def decode_latents(vae_decoder, vae_params, latents: jnp.ndarray,
                   scaling_factor: float = 0.13025) -> jnp.ndarray:
    """latents -> images in [0, 1] float32 (fp32 decode, like the reference
    upcast path, pipeline...py:965-981)."""
    imgs = vae_decoder.apply({"params": vae_params},
                             latents.astype(jnp.float32) / scaling_factor)
    return jnp.clip(imgs / 2.0 + 0.5, 0.0, 1.0)
