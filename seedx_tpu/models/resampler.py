"""Qwen-style attention-pool Resampler.

One cross-attention layer pooling a variable-length token set onto a fixed
grid of learned queries with 2D sincos position embeddings.  Used three ways,
exactly as the reference (reference: src/models/tokenizer/qwen_visual.py:94-149,
configs/clm_models/agent_seed_x.yaml:2-15):

  * ViT attn_pool: 256 queries, embed 4096, kv_dim 1664 (width of ViT-bigG),
  * agent input resampler:  64 queries, embed 5120 (LLaMA hidden), kv_dim 4096,
  * agent output resampler: 64 queries, embed 4096, kv_dim 5120.

Position embeddings are fixed (non-trainable) sincos tables; when the kv set
comes from a different grid size they are resized bilinearly/bicubically, like
the reference's ``get_abs_pos`` (qwen_visual.py:24-40).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from seedx_tpu.models.layers import PDense, PLayerNorm, TorchMHA, default_init


def sincos_2d_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """2D sincos position table [grid_size**2, embed_dim]
    (reference: qwen_visual.py:44-91)."""
    assert embed_dim % 4 == 0
    pos = np.arange(grid_size, dtype=np.float32)
    grid_w, grid_h = np.meshgrid(pos, pos)  # w varies fastest, as reference

    def embed_1d(dim, coords):
        omega = np.arange(dim // 2, dtype=np.float32) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", coords.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb_h = embed_1d(embed_dim // 2, grid_h)
    emb_w = embed_1d(embed_dim // 2, grid_w)
    return np.concatenate([emb_h, emb_w], axis=1)  # [g*g, D]


def resize_pos_embed(pos: jnp.ndarray, tgt_tokens: int) -> jnp.ndarray:
    """Resize a square [src_tokens, dim] table to [tgt_tokens, dim]
    (reference ``get_abs_pos``, qwen_visual.py:24-40; bicubic)."""
    src_size = int(math.isqrt(pos.shape[0]))
    tgt_size = int(math.isqrt(tgt_tokens))
    if src_size == tgt_size:
        return pos
    grid = pos.reshape(src_size, src_size, -1).astype(jnp.float32)
    out = jax.image.resize(grid, (tgt_size, tgt_size, grid.shape[-1]), method="bicubic")
    return out.reshape(tgt_size * tgt_size, -1).astype(pos.dtype)


class Resampler(nn.Module):
    """Cross-attention pooling onto ``grid_size**2`` learned queries."""

    grid_size: int
    embed_dim: int
    num_heads: int
    kv_dim: Optional[int] = None
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @property
    def num_queries(self) -> int:
        return self.grid_size ** 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [batch, n_tokens, kv_dim] -> [batch, num_queries, embed_dim]."""
        nq = self.num_queries
        query = self.param(
            "query",
            nn.with_logical_partitioning(default_init, ("queries", "embed")),
            (nq, self.embed_dim), self.param_dtype)
        # Fixed sincos table — a constant, not a checkpointed parameter.
        pos = jnp.asarray(sincos_2d_pos_embed(self.embed_dim, self.grid_size),
                          dtype=self.dtype)

        if self.kv_dim is not None and self.kv_dim != self.embed_dim:
            x = PDense(self.embed_dim, kernel_axes=("kv", "embed"), use_bias=False,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="kv_proj")(x)
        x = PLayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                       name="ln_kv")(x)

        q = PLayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                       name="ln_q")(query.astype(self.dtype))
        kv_pos = resize_pos_embed(pos, x.shape[1])

        q_in = (q + pos)[None].astype(self.dtype)
        q_in = jnp.broadcast_to(q_in, (x.shape[0], nq, self.embed_dim))
        k_in = x + kv_pos[None]

        out = TorchMHA(num_heads=self.num_heads, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="attn")(q_in, k_in, x)
        return out
