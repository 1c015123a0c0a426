"""De-tokenizer resampler: 64 generated visual embeddings -> SDXL conditioning.

Capability parity with the reference's ``ResamplerXLV2``
(reference: src/models/detokenizer/resampler.py:226-286, config
configs/sdxl_adapter/*.yaml: dim 1024, depth 4, dim_head 64, heads 16,
num_queries 64, embedding_dim 4096, output1 768 + output2 1280, ff_mult 4,
normalize False):

  * 4 perceiver blocks: cross-attention of learned latents over
    [input tokens ++ latents] (open-flamingo style, resampler.py:30-75),
  * dual text-stream heads: ``unet_proj_1``(768) ++ ``unet_proj_2``(1280)
    -> 2048-d ``prompt_embeds``; ``AttentionPool2d`` -> 1280-d pooled embeds
    (the SDXL ``text_embeds`` added-condition).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from seedx_tpu.models.layers import PDense, PLayerNorm
from seedx_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class DetokenizerConfig:
    dim: int = 1024
    depth: int = 4
    dim_head: int = 64
    heads: int = 16
    num_queries: int = 64
    embedding_dim: int = 4096
    output1_dim: int = 768
    output2_dim: int = 1280
    ff_mult: int = 4
    normalize: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32


class PerceiverAttention(nn.Module):
    """(reference: resampler.py:30-75) — kv over concat(x, latents); the
    1/sqrt(sqrt(d)) double-scaling trick for fp16 stability is kept."""

    cfg: DetokenizerConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, latents: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        inner = cfg.dim_head * cfg.heads
        x = PLayerNorm(epsilon=1e-5, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                       name="norm1")(x)
        latents = PLayerNorm(epsilon=1e-5, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                             name="norm2")(latents)
        b, l, _ = latents.shape

        q = PDense(inner, kernel_axes=("embed", "heads"), use_bias=False,
                   dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                   name="to_q")(latents)
        kv_input = jnp.concatenate([x, latents], axis=-2)
        kv = PDense(2 * inner, kernel_axes=("embed", "heads"), use_bias=False,
                    dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                    name="to_kv")(kv_input)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads(t):
            return t.reshape(*t.shape[:-1], cfg.heads, cfg.dim_head)

        out = dot_product_attention(heads(q), heads(k), heads(v),
                                    scale=1.0 / cfg.dim_head ** 0.5,
                                    impl="xla")
        out = out.reshape(b, l, inner)
        return PDense(cfg.dim, kernel_axes=("heads", "embed"), use_bias=False,
                      dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                      name="to_out")(out)


class FeedForward(nn.Module):
    """LN -> Linear -> GELU -> Linear, no biases (reference: resampler.py:9-16)."""

    cfg: DetokenizerConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        h = PLayerNorm(epsilon=1e-5, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                       name="norm")(x)
        h = PDense(cfg.dim * cfg.ff_mult, kernel_axes=("embed", "mlp"),
                   use_bias=False, dtype=cfg.dtype,
                   param_dtype=cfg.param_dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        return PDense(cfg.dim, kernel_axes=("mlp", "embed"), use_bias=False,
                      dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                      name="fc2")(h)


class AttentionPool2d(nn.Module):
    """CLIP-style attention pooling (reference: resampler.py:78-116)."""

    num_heads: int
    output_dim: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [B, N, C] -> [B, output_dim]
        b, n, c = x.shape
        mean = jnp.mean(x, axis=1, keepdims=True)
        x = jnp.concatenate([mean, x], axis=1)          # [B, N+1, C]
        pos = self.param(
            "positional_embedding",
            nn.with_logical_partitioning(
                nn.initializers.normal(stddev=c ** -0.5), (None, "embed")),
            (n + 1, c), self.param_dtype)
        x = x + pos[None].astype(x.dtype)

        def proj(name, feats, x):
            return PDense(feats, kernel_axes=("embed", "heads"),
                          dtype=self.dtype, param_dtype=self.param_dtype,
                          name=name)(x)

        q = proj("q_proj", c, x)
        k = proj("k_proj", c, x)
        v = proj("v_proj", c, x)
        hd = c // self.num_heads

        def heads(t):
            return t.reshape(b, -1, self.num_heads, hd)

        out = dot_product_attention(heads(q), heads(k), heads(v), impl="xla")
        out = out.reshape(b, n + 1, c)
        out = PDense(self.output_dim, kernel_axes=("heads", "embed"),
                     dtype=self.dtype, param_dtype=self.param_dtype,
                     name="c_proj")(out)
        return out[:, 0]


class ResamplerXL(nn.Module):
    """Perceiver resampler emitting SDXL dual conditioning streams."""

    cfg: DetokenizerConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: [B, T, embedding_dim] -> (prompt_embeds [B, nq, 2048],
        pooled [B, 1280])."""
        cfg = self.cfg
        latents = self.param(
            "latents",
            nn.with_logical_partitioning(
                nn.initializers.normal(stddev=cfg.dim ** -0.5),
                (None, "queries", "embed")),
            (1, cfg.num_queries, cfg.dim), cfg.param_dtype)
        lat = jnp.broadcast_to(latents.astype(cfg.dtype),
                               (x.shape[0], cfg.num_queries, cfg.dim))

        if cfg.normalize:
            # reference: F.normalize(x) with torch's DEFAULT dim=1 — the
            # l2 norm runs over the TOKEN axis, not the feature axis
            # (resampler.py:271-272); verified by the torch oracle test
            xf = x.astype(jnp.float32)
            norm = jnp.linalg.norm(xf, axis=1, keepdims=True)
            x = (xf / jnp.maximum(norm, 1e-12)).astype(x.dtype)
        x = PDense(cfg.dim, kernel_axes=("kv", "embed"), dtype=cfg.dtype,
                   param_dtype=cfg.param_dtype, name="proj_in")(x)

        for i in range(cfg.depth):
            lat = PerceiverAttention(cfg, name=f"attn_{i}")(x, lat) + lat
            lat = FeedForward(cfg, name=f"ff_{i}")(lat) + lat

        hidden = PLayerNorm(epsilon=1e-5, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                            name="norm_out")(lat)
        e1 = PDense(cfg.output1_dim, kernel_axes=("embed", "mlp"),
                    dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                    name="unet_proj_1")(hidden)
        e2 = PDense(cfg.output2_dim, kernel_axes=("embed", "mlp"),
                    dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                    name="unet_proj_2")(hidden)
        prompt_embeds = jnp.concatenate([e1, e2], axis=-1)
        pooled = AttentionPool2d(num_heads=cfg.heads,
                                 output_dim=cfg.output2_dim,
                                 dtype=cfg.dtype,
                                 param_dtype=cfg.param_dtype,
                                 name="unet_attnpool")(hidden)
        return prompt_embeds, pooled


class ResamplerXLIdentity(nn.Module):
    """Pass-through variant (reference: resampler.py:288-293)."""

    @nn.compact
    def __call__(self, x, pooled=None):
        return x, pooled
