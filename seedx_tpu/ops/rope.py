"""Rotary position embeddings.

Matches the reference's ``LlamaRotaryEmbedding`` + ``apply_rotary_pos_emb``
(reference: src/models/mllm/modeling_llama_xformer.py:97-149): half-split
rotate, theta base 10000, non-scaled.  Computed on the fly in fp32 — on TPU
this is a few VPU ops fused into the attention prologue; there is no benefit
to the reference's host-side cos/sin cache.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def rope_cos_sin(positions: jnp.ndarray, head_dim: int,
                 theta: float = 10000.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for integer positions.

    Args:
      positions: [...] int array of absolute positions.
      head_dim: per-head dimension (even).

    Returns:
      (cos, sin) with shape positions.shape + (head_dim,), fp32.
    """
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., head_dim/2]
    angles = jnp.concatenate([angles, angles], axis=-1)           # [..., head_dim]
    return jnp.cos(angles), jnp.sin(angles)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply rotary embedding.

    Args:
      x: [batch, seq, heads, head_dim].
      cos/sin: [batch, seq, head_dim] or [seq, head_dim].
    """
    if cos.ndim == x.ndim - 2:      # [seq, head_dim] -> broadcast over batch
        cos = cos[None]
        sin = sin[None]
    cos = cos[:, :, None, :]        # [batch, seq, 1, head_dim]
    sin = sin[:, :, None, :]
    out = x.astype(jnp.float32) * cos + _rotate_half(x.astype(jnp.float32)) * sin
    return out.astype(x.dtype)
