"""Pallas TPU flash attention (forward), exact, blockwise.

TPU-native replacement for the xformers CUDA kernel used by the reference
(reference: src/models/mllm/modeling_llama_xformer.py:225-237).

Design (flash-attention-2 style):
  * grid = (batch, heads, q_blocks); each program owns one q tile and loops
    over k/v tiles with a running (max, sum, acc) in fp32,
  * k/v for one (batch, head) stay resident in VMEM (sequences here are
    ≤ a few k tokens: training max 880, reference configs/data/*.yaml),
  * causal + right-padding masks folded in via per-sequence lengths held in
    SMEM (scalar prefetch), with the k-loop upper bound trimmed so fully
    masked tiles are never touched,
  * backward pass = XLA recompute via ``jax.custom_vjp`` (cheap relative to
    the 13B matmuls; a Pallas backward is a later optimization).

Written blockwise so a context-parallel axis can be layered on later
(SURVEY.md §5 long-context note).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from seedx_tpu.ops.attention import NEG_INF, make_attention_bias, _xla_attention

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256


def _flash_fwd_kernel(lengths_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float,
                      causal: bool, block_k: int, kv_len: int):
    # q_ref: [block_q, head_dim]; k_ref/v_ref: [kv_len, head_dim]
    block_q, head_dim = q_ref.shape
    iq = pl.program_id(2)
    b = pl.program_id(0)

    q = q_ref[:].astype(jnp.float32) * scale

    length = lengths_ref[b]
    num_k_by_len = pl.cdiv(length, block_k)
    if causal:
        num_k_causal = pl.cdiv((iq + 1) * block_q, block_k)
        num_k = jnp.minimum(num_k_by_len, num_k_causal)
    else:
        num_k = num_k_by_len

    q_pos = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)

    def body(j, carry):
        acc, m, l = carry
        k_tile = k_ref[pl.ds(j * block_k, block_k), :]
        v_tile = v_ref[pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k_tile.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [block_q, block_k]
        k_pos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = k_pos < length
        if causal:
            mask = jnp.logical_and(mask, q_pos >= k_pos)
        s = jnp.where(mask, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[:, None])
        l_new = l * alpha + jnp.sum(p, axis=-1)
        pv = jax.lax.dot_general(
            p.astype(v_tile.dtype), v_tile,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_new = acc * alpha[:, None] + pv
        return acc_new, m_new, l_new

    init = (
        jnp.zeros((block_q, head_dim), jnp.float32),
        jnp.full((block_q,), NEG_INF, jnp.float32),
        jnp.zeros((block_q,), jnp.float32),
    )
    acc, m, l = jax.lax.fori_loop(0, num_k, body, init)
    # Fully-masked rows (query beyond length) produce l == 0; emit zeros.
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[:] = (acc / l_safe[:, None]).astype(o_ref.dtype)


def _flash_forward(q, k, v, lengths, causal, scale, block_q, block_k):
    b, q_len, heads, head_dim = q.shape
    kv_len = k.shape[1]
    block_q = min(block_q, q_len)
    block_k = min(block_k, kv_len)
    if q_len % block_q or kv_len % block_k:
        raise ValueError(f"seq lens ({q_len},{kv_len}) must be multiples of "
                         f"blocks ({block_q},{block_k})")
    if lengths is None:
        lengths = jnp.full((b,), kv_len, jnp.int32)

    # [b, s, h, d] -> [b, h, s, d] for contiguous per-head tiles.
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)

    grid = (b, heads, q_len // block_q)
    kernel = functools.partial(
        _flash_fwd_kernel, scale=scale, causal=causal,
        block_k=block_k, kv_len=kv_len,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((None, None, block_q, head_dim),
                             lambda ib, ih, iq, *_: (ib, ih, iq, 0)),
                pl.BlockSpec((None, None, kv_len, head_dim),
                             lambda ib, ih, iq, *_: (ib, ih, 0, 0)),
                pl.BlockSpec((None, None, kv_len, head_dim),
                             lambda ib, ih, iq, *_: (ib, ih, 0, 0)),
            ],
            out_specs=pl.BlockSpec((None, None, block_q, head_dim),
                                   lambda ib, ih, iq, *_: (ib, ih, iq, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * q_len * kv_len * head_dim,
            bytes_accessed=(qt.size + kt.size + vt.size) * qt.dtype.itemsize,
            transcendentals=b * heads * q_len * kv_len,
        ),
    )(lengths.astype(jnp.int32), qt, kt, vt)
    return jnp.swapaxes(out, 1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash(q, k, v, lengths, causal, scale, block_q, block_k):
    return _flash_forward(q, k, v, lengths, causal, scale, block_q, block_k)


def _flash_fwd(q, k, v, lengths, causal, scale, block_q, block_k):
    out = _flash_forward(q, k, v, lengths, causal, scale, block_q, block_k)
    return out, (q, k, v, lengths)


def _flash_bwd(causal, scale, block_q, block_k, residuals, g):
    q, k, v, lengths = residuals

    def ref_fn(q, k, v):
        kv_valid = None
        if lengths is not None:
            kv_valid = jnp.arange(k.shape[1])[None, :] < lengths[:, None]
        bias = make_attention_bias(kv_valid, q.shape[1], k.shape[1], causal)
        return _xla_attention(q, k, v, bias, scale)

    _, vjp = jax.vjp(ref_fn, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    lengths: Optional[jnp.ndarray] = None,
    causal: bool = True,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """Exact blockwise attention.

    Args:
      q, k, v: [batch, seq, heads, head_dim] (same seq for q and kv).
      lengths: [batch] int32 count of valid (right-padded) kv positions.
      causal: apply causal mask.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash(q, k, v, lengths, causal, scale, block_q, block_k)
