"""SDXL AutoencoderKL (VAE), TPU-native flax implementation.

Parity with the diffusers VAE used by the reference
(reference: src/inference/eval_text2img_seed_x_i.py:62; encoder used with
``.mode()`` for edit condition latents,
pipeline_stable_diffusion_xl_t2i_edit.py:490-551; decode with fp32 upcast,
:965-986).  Geometry: channels (128, 256, 512, 512), 2 resnets per encoder
block / 3 per decoder block, mid attn, latent channels 4,
scaling_factor 0.13025.  NHWC; decode runs fp32 (SDXL VAE overflows fp16 —
the reference upcasts too).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

SDXL_VAE_SCALING = 0.13025


def _spatial_constraint(x: jnp.ndarray) -> jnp.ndarray:
    """Latent/image rows shard over the ``tensor`` axis under an active mesh
    + logical rules (SDXLAdapter.shard) — same mechanism as the UNet; no-op
    otherwise.  The 1024² fp32 decode is the heaviest single activation in
    the stack (128 MB at the output conv), so GSPMD halo-exchanged convs
    pay off immediately on a slice."""
    return nn.with_logical_constraint(x, ("cfg_batch", "height", None, None))


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    channels: Tuple[int, ...] = (128, 256, 512, 512)
    latent_channels: int = 4
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = SDXL_VAE_SCALING
    dtype: Any = jnp.float32      # fp32: SDXL VAE is fp16-unstable
    param_dtype: Any = jnp.float32


def sdxl_vae(**overrides) -> VAEConfig:
    return VAEConfig(**overrides)


def vae_debug(**overrides) -> VAEConfig:
    kw = dict(channels=(16, 32), norm_num_groups=8)
    kw.update(overrides)
    return VAEConfig(**kw)


class VAEResnet(nn.Module):
    out_channels: int
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6, dtype=cfg.dtype,
                         param_dtype=cfg.param_dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, name="conv1")(h)
        h = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6, dtype=cfg.dtype,
                         param_dtype=cfg.param_dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype, name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head spatial self-attention in the mid block."""

    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        b, h, w, c = x.shape
        hidden = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6,
                              dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                              name="group_norm")(x)
        hidden = hidden.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     name="to_q")(hidden)
        k = nn.Dense(c, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     name="to_k")(hidden)
        v = nn.Dense(c, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     name="to_v")(hidden)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k) / jnp.sqrt(c), axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", attn, v)
        out = nn.Dense(c, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                       name="to_out")(out)
        return x + out.reshape(b, h, w, c)


class VAEEncoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images [B, H, W, 3] in [-1, 1] -> moments [B, h, w, 2*latent]."""
        cfg = self.cfg
        x = nn.Conv(cfg.channels[0], (3, 3), padding=1, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype,
                    name="conv_in")(images.astype(cfg.dtype))
        for i, ch in enumerate(cfg.channels):
            for j in range(cfg.layers_per_block):
                x = VAEResnet(ch, cfg, name=f"down_{i}_res_{j}")(x)
            if i < len(cfg.channels) - 1:
                x = nn.Conv(ch, (3, 3), strides=(2, 2),
                            padding=((0, 1), (0, 1)), dtype=cfg.dtype,
                            param_dtype=cfg.param_dtype,
                            name=f"down_{i}_downsample")(x)
        ch = cfg.channels[-1]
        x = VAEResnet(ch, cfg, name="mid_res_0")(x)
        x = VAEAttention(cfg, name="mid_attn")(x)
        x = VAEResnet(ch, cfg, name="mid_res_1")(x)
        x = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6, dtype=cfg.dtype,
                         param_dtype=cfg.param_dtype, name="norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                    dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                    name="conv_out")(x)
        return nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=cfg.dtype,
                       param_dtype=cfg.param_dtype, name="quant_conv")(x)


class VAEDecoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, latents: jnp.ndarray) -> jnp.ndarray:
        """latents [B, h, w, latent] (unscaled) -> images [B, H, W, 3]."""
        cfg = self.cfg
        x = nn.Conv(cfg.latent_channels, (1, 1), dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype,
                    name="post_quant_conv")(latents.astype(cfg.dtype))
        ch = cfg.channels[-1]
        x = nn.Conv(ch, (3, 3), padding=1, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, name="conv_in")(x)
        x = VAEResnet(ch, cfg, name="mid_res_0")(x)
        x = VAEAttention(cfg, name="mid_attn")(x)
        x = VAEResnet(ch, cfg, name="mid_res_1")(x)
        x = _spatial_constraint(x)
        for i, ch in enumerate(reversed(cfg.channels)):
            for j in range(cfg.layers_per_block + 1):
                x = VAEResnet(ch, cfg, name=f"up_{i}_res_{j}")(x)
            if i < len(cfg.channels) - 1:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
                x = _spatial_constraint(
                    nn.Conv(c, (3, 3), padding=1, dtype=cfg.dtype,
                            param_dtype=cfg.param_dtype,
                            name=f"up_{i}_upsample")(x))
        x = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6, dtype=cfg.dtype,
                         param_dtype=cfg.param_dtype, name="norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(3, (3, 3), padding=1, dtype=cfg.dtype,
                       param_dtype=cfg.param_dtype, name="conv_out")(x)


def sample_moments(moments: jnp.ndarray, rng=None) -> jnp.ndarray:
    """Split moments into (mean, logvar); sample or take the mode.

    The reference uses ``.mode()`` (the mean) for edit condition latents
    (pipeline...py:523) and ``.sample()`` during adapter training.
    """
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if rng is None:
        return mean
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
