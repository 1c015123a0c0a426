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

    # first half encodes the w meshgrid, second the h meshgrid — the
    # reference's emb_h is (misleadingly) built from grid[0] == the w grid
    # (qwen_visual.py:62-70 with grid = np.meshgrid(grid_w, grid_h));
    # verified against the imported reference in tests/test_image_oracles.py
    emb_w = embed_1d(embed_dim // 2, grid_w)
    emb_h = embed_1d(embed_dim // 2, grid_h)
    return np.concatenate([emb_w, emb_h], axis=1)  # [g*g, D]


def _torch_bicubic_matrix(src: int, tgt: int) -> np.ndarray:
    """[tgt, src] interpolation matrix reproducing torch's
    ``F.interpolate(mode="bicubic", align_corners=False)`` exactly: cubic
    convolution kernel a = -0.75 at half-pixel sample centers with
    edge-clamped taps and NO antialias widening (torch's default) — both
    unlike ``jax.image.resize`` (Keys a = -0.5, antialiased downsampling).
    Built once per (src, tgt) at trace time; the resize is then one matmul
    per axis."""
    a = -0.75

    def k(d):
        d = abs(d)
        if d <= 1.0:
            return (a + 2.0) * d ** 3 - (a + 3.0) * d ** 2 + 1.0
        if d < 2.0:
            return a * d ** 3 - 5.0 * a * d ** 2 + 8.0 * a * d - 4.0 * a
        return 0.0

    scale = src / tgt
    w = np.zeros((tgt, src), np.float64)
    for i in range(tgt):
        x = (i + 0.5) * scale - 0.5
        x0 = math.floor(x)
        t = x - x0
        for j, d in ((x0 - 1, t + 1.0), (x0, t), (x0 + 1, 1.0 - t),
                     (x0 + 2, 2.0 - t)):
            w[i, min(max(j, 0), src - 1)] += k(d)
    return w.astype(np.float32)


def resize_pos_embed(pos: jnp.ndarray, tgt_tokens: int) -> jnp.ndarray:
    """Resize a square [src_tokens, dim] table to [tgt_tokens, dim]
    (reference ``get_abs_pos``, qwen_visual.py:24-40: torch bicubic,
    align_corners=False; kernel parity verified by the imported-reference
    oracle in tests/test_image_oracles.py)."""
    src_size = int(math.isqrt(pos.shape[0]))
    tgt_size = int(math.isqrt(tgt_tokens))
    if src_size == tgt_size:
        return pos
    grid = pos.reshape(src_size, src_size, -1).astype(jnp.float32)
    w = jnp.asarray(_torch_bicubic_matrix(src_size, tgt_size))
    rows = jnp.einsum("ts,shc->thc", w, grid)     # resize axis 0
    out = jnp.einsum("ts,hsc->htc", w, rows)      # resize axis 1
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
