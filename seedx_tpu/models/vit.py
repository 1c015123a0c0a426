"""Qwen ViT-bigG/14 visual (de)tokenizer front-end, TPU-native.

Capabilities match the reference ``VisionTransformerWithAttnPool``
(reference: src/models/tokenizer/qwen_visual.py:325-459; hyperparameters from
configs/visual_encoder/qwen_vitg_448.yaml: width 1664, 48 layers, 16 heads,
mlp_ratio 4.9231, 448px/14px patches -> 1024 tokens, attention-pooled to 256
queries at 4096-d).

TPU-first design decisions (not a torch translation):
  * the 48 blocks run under ``nn.scan`` (single compiled block, layer dim
    stacked) + ``nn.remat``, matching the reference's hardcoded per-block
    gradient checkpointing (qwen_visual.py:311-314) with one compile instead
    of 48,
  * patchify = conv fused by XLA onto the MXU; qkv fused into one matmul,
  * everything bf16 with fp32 layernorm statistics.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from seedx_tpu.models.layers import MLP, PDense, PLayerNorm, default_init
from seedx_tpu.models.resampler import Resampler, resize_pos_embed
from seedx_tpu.ops.attention import dot_product_attention

# CLIP normalization constants (reference: qwen_visual.py:344-345).
IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 448
    patch_size: int = 14
    width: int = 1664
    layers: int = 48
    heads: int = 16
    mlp_ratio: float = 4.9231
    n_queries: int = 256
    output_dim: int = 4096
    patch_pos: bool = False
    pos_embed_len: int = 256  # stored table; resized to the token grid
    pool_heads: int = 0       # attn-pool heads; 0 -> output_dim // 128
    # "int8": trunk-block projections stored int8 + per-output fp32 scales
    # (~97% of the 1.9B params; patchify conv, pos embeds, and the attn-pool
    # resampler stay high precision).  Serving memory fit: 3.8 -> 1.9 GB so
    # ViT + int4 LLM + int8 UNet co-reside on one 16G chip.  Encode is
    # compute-bound (NOTES_r1: at the MXU roofline), so this trades nothing.
    quantization: str = "none"
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @property
    def mlp_hidden(self) -> int:
        return int(self.width * self.mlp_ratio)

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


def qwen_vitg_448(**overrides) -> "ViTConfig":
    """The flagship config (configs/visual_encoder/qwen_vitg_448.yaml)."""
    return ViTConfig(**overrides)


def vit_tiny_debug(**overrides) -> "ViTConfig":
    """Tiny factory mirroring the reference DEBUG_FLAG model
    (qwen_visual.py:433-446)."""
    kw = dict(width=128, layers=2, heads=4, mlp_ratio=2.0, output_dim=128)
    kw.update(overrides)
    return ViTConfig(**kw)


class ViTBlock(nn.Module):
    """Pre-LN transformer block (reference ``VisualAttentionBlock``,
    qwen_visual.py:233-282)."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, _=None):
        cfg = self.cfg
        h = PLayerNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="ln_1")(x)
        qkv = PDense(3 * cfg.width, kernel_axes=("embed", "heads"),
                     dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     quantize=cfg.quantization,
                     name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        head_dim = cfg.width // cfg.heads

        def heads(t):
            return t.reshape(*t.shape[:-1], cfg.heads, head_dim)

        attn = dot_product_attention(heads(q), heads(k), heads(v),
                                     impl="auto")
        attn = attn.reshape(*x.shape)
        attn = PDense(cfg.width, kernel_axes=("heads", "embed"), dtype=cfg.dtype,
                      param_dtype=cfg.param_dtype, quantize=cfg.quantization,
                      name="out_proj")(attn)
        x = x + attn
        h = PLayerNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="ln_2")(x)
        x = x + MLP(cfg.mlp_hidden, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                    quantize=cfg.quantization, name="mlp")(h)
        return x, None


class VisionTransformer(nn.Module):
    """Patchify + transformer trunk + attention-pool head.

    __call__(images [B, H, W, 3 | NHWC], patch_positions [B, 2] optional)
      -> [B, n_queries, output_dim]
    """

    cfg: ViTConfig
    remat: bool = True

    @nn.compact
    def __call__(self, images: jnp.ndarray,
                 patch_positions: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.cfg
        x = nn.Conv(
            features=cfg.width,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            kernel_init=nn.with_logical_partitioning(
                default_init, (None, None, None, "conv_io")),
            name="conv1",
        )(images.astype(cfg.dtype))
        b = x.shape[0]
        x = x.reshape(b, -1, cfg.width)  # [B, grid*grid, width]

        pos = self.param(
            "positional_embedding",
            nn.with_logical_partitioning(
                nn.initializers.normal(stddev=cfg.width ** -0.5), (None, "embed")),
            (cfg.pos_embed_len, cfg.width), cfg.param_dtype)
        x = x + resize_pos_embed(pos.astype(cfg.dtype), x.shape[1])[None]

        x = PLayerNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="ln_pre")(x)

        block = ViTBlock
        if self.remat:
            block = nn.remat(block, prevent_cse=False)
        x, _ = nn.scan(
            block,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.layers,
            metadata_params={nn.PARTITION_NAME: "layers"},
        )(cfg, name="blocks")(x)

        x = Resampler(
            grid_size=int(cfg.n_queries ** 0.5),
            embed_dim=cfg.output_dim,
            num_heads=cfg.pool_heads or max(1, cfg.output_dim // 128),
            kv_dim=cfg.width,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            name="attn_pool",
        )(x)

        if cfg.patch_pos:
            # 4-corner interpolated tile-position embedding
            # (reference: qwen_visual.py:379-382,407-413).
            ppe = self.param(
                "patch_pos_embed",
                nn.with_logical_partitioning(
                    nn.initializers.normal(stddev=cfg.output_dim ** -0.5),
                    (None, "embed")),
                (4, cfg.output_dim), cfg.param_dtype)
            coords = jnp.concatenate(
                [patch_positions, 1.0 - patch_positions], axis=-1) / 2.0
            x = x + jnp.dot(coords.astype(cfg.dtype), ppe.astype(cfg.dtype))[:, None]

        x = PLayerNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="ln_post")(x)
        proj = self.param(
            "proj",
            nn.with_logical_partitioning(
                nn.initializers.normal(stddev=cfg.output_dim ** -0.5),
                ("embed", None)),
            (cfg.output_dim, cfg.output_dim), cfg.param_dtype)
        return jnp.dot(x, proj.astype(cfg.dtype))


def vit_downsample(embeds: jnp.ndarray, pool: int = 4) -> jnp.ndarray:
    """Average-pool the token axis 256 -> 64 (reference ``vit_down``,
    seed_x.py:103-106: avg_pool1d kernel=4 stride=4)."""
    b, n, d = embeds.shape
    return jnp.mean(embeds.reshape(b, n // pool, pool, d), axis=2)
