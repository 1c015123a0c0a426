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


def _flash_fwd_kernel(starts_ref, ends_ref, qoff_ref, q_ref, k_ref, v_ref,
                      o_ref, *, scale: float, causal: bool, block_k: int,
                      kv_len: int):
    # q_ref: [block_q, head_dim]; k_ref/v_ref: [kv_len, head_dim]
    # valid kv cells per batch = the window [starts[b], ends[b]) — this
    # covers right-padded training masks AND left-padded generation prompts
    # qoff_ref: [1] global kv position of q row 0 (prefill-into-cache offset)
    block_q, head_dim = q_ref.shape
    iq = pl.program_id(2)
    b = pl.program_id(0)

    q = q_ref[:].astype(jnp.float32) * scale

    q_offset = qoff_ref[0]
    start = starts_ref[b]
    end = ends_ref[b]
    first_k = start // block_k          # fully-masked head tiles skipped
    num_k_by_len = pl.cdiv(end, block_k)
    if causal:
        num_k_causal = pl.cdiv(q_offset + (iq + 1) * block_q, block_k)
        num_k = jnp.minimum(num_k_by_len, num_k_causal)
    else:
        num_k = num_k_by_len

    q_pos = q_offset + iq * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0)

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
        mask = jnp.logical_and(k_pos >= start, k_pos < end)
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
    acc, m, l = jax.lax.fori_loop(first_k, num_k, body, init)
    # Fully-masked rows (query beyond length) produce l == 0; emit zeros.
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[:] = (acc / l_safe[:, None]).astype(o_ref.dtype)


def _flash_forward(q, k, v, starts, ends, q_offset, causal, scale, block_q,
                   block_k):
    b, q_len, heads, head_dim = q.shape
    kv_len = k.shape[1]
    # shrink blocks until they divide the sequence (128 floor = VPU tile)
    while block_q > 128 and q_len % block_q:
        block_q //= 2
    while block_k > 128 and kv_len % block_k:
        block_k //= 2
    block_q = min(block_q, q_len)
    block_k = min(block_k, kv_len)
    if q_len % block_q or kv_len % block_k:
        raise ValueError(f"seq lens ({q_len},{kv_len}) must be multiples of "
                         f"blocks ({block_q},{block_k})")
    if starts is None:
        starts = jnp.zeros((b,), jnp.int32)
    if ends is None:
        ends = jnp.full((b,), kv_len, jnp.int32)
    if q_offset is None:
        q_offset = kv_len - q_len
    q_offset = jnp.asarray(q_offset, jnp.int32).reshape(1)

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
            num_scalar_prefetch=3,
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
    )(starts.astype(jnp.int32), ends.astype(jnp.int32), q_offset, qt, kt, vt)
    return jnp.swapaxes(out, 1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _flash(q, k, v, starts, ends, q_offset, causal, scale, block_q, block_k):
    return _flash_forward(q, k, v, starts, ends, q_offset, causal, scale,
                          block_q, block_k)


def _flash_fwd(q, k, v, starts, ends, q_offset, causal, scale, block_q,
               block_k):
    out = _flash_forward(q, k, v, starts, ends, q_offset, causal, scale,
                         block_q, block_k)
    return out, (q, k, v, starts, ends, q_offset)


def _flash_bwd(causal, scale, block_q, block_k, residuals, g):
    q, k, v, starts, ends, q_offset = residuals

    def ref_fn(q, k, v):
        pos = jnp.arange(k.shape[1])[None, :]
        lo = starts[:, None] if starts is not None else 0
        hi = ends[:, None] if ends is not None else k.shape[1]
        kv_valid = (pos >= lo) & (pos < hi)
        bias = make_attention_bias(kv_valid, q.shape[1], k.shape[1], causal,
                                   q_offset=q_offset)
        return _xla_attention(q, k, v, bias, scale)

    _, vjp = jax.vjp(ref_fn, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    lengths: Optional[jnp.ndarray] = None,
    starts: Optional[jnp.ndarray] = None,
    ends: Optional[jnp.ndarray] = None,
    q_offset=None,
    causal: bool = True,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """Exact blockwise attention with a per-batch valid kv window.

    Args:
      q, k, v: [batch, seq, heads, head_dim]; kv seq may exceed q seq
        (prefill into a preallocated cache).
      lengths: [batch] right-padded convenience alias for ends (starts=0).
      starts/ends: [batch] int32 valid window [start, end) — handles BOTH
        right-padded training masks and left-padded generation prompts.
      q_offset: kv position of q row 0 (default: aligned to the kv tail).
      causal: apply causal mask.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if lengths is not None:
        assert starts is None and ends is None
        ends = lengths
    return _flash(q, k, v, starts, ends, q_offset, causal, scale, block_q,
                  block_k)
