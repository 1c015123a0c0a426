"""Ragged (and optionally paged) decode attention — Pallas TPU.

Single-token decode attention over the flat KV cache layout of
``models/llama.py`` (``[batch, max_len, kv_heads*head_dim]``), reading ONLY
the valid window ``[starts_b, ends_b)`` of every row via an explicit
double-buffered HBM->VMEM DMA loop.

Why this kernel exists: at decode (q_len == 1) the XLA attention path —
and equally the blockwise flash kernel, whose BlockSpec pipeline copies the
WHOLE k/v row into VMEM before the in-kernel window trimming can skip tiles
— streams the full ``max_len`` cache every step.  For batched serving the
cache read is the same order as the quantized weight stream (13B, 8 slots
x 1280 positions of int8 KV ~ 4.2 GB/step vs ~6.6 GB int4 weights), so
reading ``mean(len)/max_len`` of it is a first-order throughput win.  The
reference has no analogue (single-prompt eager HF decode,
src/models/mllm/seed_x.py:184-189).

Capabilities:
  * per-row contiguous windows ``[start, end)`` — the invariant every
    cache path in this repo maintains (left-padded prompts + cache tail);
  * bf16 cache or int8 cache + per-(position, head) scales
    (``quantize_kv`` layout) — HBM reads stay int8, dequant on the VPU;
  * grouped-query attention (q_heads = G * kv_heads, grouped-contiguous);
  * optional ``block_tables [batch, max_len // block]``: logical KV tile j
    of row b is fetched from PHYSICAL tile ``block_tables[b, j]`` of a
    shared pool ``[pool_tiles * block, kv_heads*head_dim]`` — vLLM-style
    paged KV, so slots share one pool instead of reserving worst-case
    dense rows.

The flash-attention streaming-softmax update matches
``ops/flash_attention.py``; fully-masked tiles are guarded explicitly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from seedx_tpu.ops.attention import NEG_INF


def _pick_block(s: int, preferred: int = 128, row_bytes: int = 0) -> int:
    """Largest power-of-two tile <= preferred that divides the cache len.

    row_bytes (one KV row's bytes) caps the tile so the double-buffered
    k+v scratch plus the kernel's fp32 [block, Hkv, G, D] temporaries stay
    well inside the ~16 MB VMEM: tile payload <= ~768 KB."""
    b = preferred
    while b > 8 and row_bytes and b * row_bytes > 768 * 1024:
        b //= 2
    while b > 1 and s % b:
        b //= 2
    return b


def _decode_kernel(starts_ref, ends_ref, tables_ref, layer_ref, q_ref,
                   k_hbm, v_hbm, ks_hbm, vs_hbm, o_ref,
                   k_buf, v_buf, ks_buf, vs_buf, sems, *,
                   scale: float, block: int, kv_heads: int, head_dim: int,
                   q_groups: int, paged: bool, int8: bool, stacked: bool):
    b = pl.program_id(0)
    start = starts_ref[b]
    end = ends_ref[b]
    j0 = start // block
    j1 = pl.cdiv(end, block)

    def row_of(j):
        # physical first row of logical tile j: paged -> pool row from the
        # block table; dense -> the row's own tile j
        if paged:
            return tables_ref[b, j] * block
        return j * block

    def src_at(hbm, j):
        """Slice [block, ...feature dims] of logical tile j for this row.

        stacked: hbm carries a leading layer axis (one standing buffer for
        ALL layers — slicing it OUTSIDE the kernel would materialise an HBM
        copy per layer, the exact trap the stacked int4 weight kernel
        exists to avoid); paged: rows come from a shared pool addressed by
        the block table.  Combined stacked+paged is the paged
        continuous-serving layout.  Works for both the [.., S, Hkv, D]
        caches and the [.., S, Hkv] scale tables."""
        def full(*lead):
            tail = (slice(None),) * (hbm.ndim - len(lead))
            return hbm.at[lead + tail]

        if stacked and paged:
            return full(layer_ref[0], pl.ds(row_of(j), block))
        if stacked:
            return full(layer_ref[0], b, pl.ds(row_of(j), block))
        if paged:
            return full(pl.ds(row_of(j), block))
        return full(b, pl.ds(row_of(j), block))

    def k_dma(slot, j):
        return pltpu.make_async_copy(src_at(k_hbm, j), k_buf.at[slot],
                                     sems.at[slot, 0])

    def v_dma(slot, j):
        return pltpu.make_async_copy(src_at(v_hbm, j), v_buf.at[slot],
                                     sems.at[slot, 1])

    def ks_dma(slot, j):
        return pltpu.make_async_copy(src_at(ks_hbm, j), ks_buf.at[slot],
                                     sems.at[slot, 2])

    def vs_dma(slot, j):
        return pltpu.make_async_copy(src_at(vs_hbm, j), vs_buf.at[slot],
                                     sems.at[slot, 3])

    def start_tile(slot, j):
        k_dma(slot, j).start()
        v_dma(slot, j).start()
        if int8:
            ks_dma(slot, j).start()
            vs_dma(slot, j).start()

    @pl.when(j1 > j0)
    def _():
        start_tile(0, j0)

    # q: [kv_heads, G, D] fp32, pre-scaled (leading-dim split only — no
    # lane<->sublane relayout)
    q = (q_ref[0].astype(jnp.float32) * scale
         ).reshape(kv_heads, q_groups, head_dim)

    def body(i, carry):
        m, l, acc = carry
        j = j0 + i
        slot = jax.lax.rem(i, 2)

        @pl.when(j + 1 < j1)
        def _():
            start_tile(jax.lax.rem(i + 1, 2), j + 1)

        k_dma(slot, j).wait()
        v_dma(slot, j).wait()
        k = k_buf[slot].astype(jnp.float32)      # [block, Hkv, D]
        v = v_buf[slot].astype(jnp.float32)
        if int8:
            ks_dma(slot, j).wait()
            vs_dma(slot, j).wait()
            k = k * ks_buf[slot].astype(jnp.float32)[:, :, None]
            v = v * vs_buf[slot].astype(jnp.float32)[:, :, None]

        # scores [block, kv_heads, G]: per-head q . k, VPU mult+reduce over
        # leading/lane-aligned dims only — no transposes or lane<->sublane
        # relayouts (bandwidth-bound kernel; no MXU needed at q_len == 1)
        s = jnp.sum(q[None, :, :, :] * k[:, :, None, :], axis=-1)

        pos = j * block + jax.lax.broadcasted_iota(jnp.int32, (block,), 0)
        valid = (pos >= start) & (pos < end)            # [block]
        s = jnp.where(valid[:, None, None], s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=0))      # [Hkv, G]
        # explicit guard: a fully-masked tile keeps m_new == NEG_INF and
        # exp(NEG_INF - NEG_INF) would be 1 — zero it instead
        p = jnp.where(valid[:, None, None],
                      jnp.exp(s - m_new[None, :, :]), 0.0)
        alpha = jnp.where(m == NEG_INF, 0.0, jnp.exp(m - m_new))
        l = l * alpha + jnp.sum(p, axis=0)
        pv = jnp.sum(p[:, :, :, None] * v[:, :, None, :], axis=0)
        acc = acc * alpha[:, :, None] + pv              # [Hkv, G, D]
        return m_new, l, acc

    shape_hg = (kv_heads, q_groups)
    init = (jnp.full(shape_hg, NEG_INF, jnp.float32),
            jnp.zeros(shape_hg, jnp.float32),
            jnp.zeros(shape_hg + (head_dim,), jnp.float32))
    m, l, acc = jax.lax.fori_loop(0, j1 - j0, body, init)

    out = acc / jnp.maximum(l, 1e-30)[:, :, None]
    o_ref[0] = out.reshape(kv_heads * q_groups, head_dim).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block", "kv_heads", "interpret"))
def ragged_decode_attention(
    q: jnp.ndarray,                 # [B, Hq, D]
    k_cache: jnp.ndarray,           # [B, S, Hkv*D]  (or pool [P*block, Hkv*D])
    v_cache: jnp.ndarray,
    starts: jnp.ndarray,            # [B] int32
    ends: jnp.ndarray,              # [B] int32 (exclusive)
    *,
    k_scale: Optional[jnp.ndarray] = None,   # [B, S, Hkv] for int8 caches
    v_scale: Optional[jnp.ndarray] = None,
    block_tables: Optional[jnp.ndarray] = None,   # [B, S // block] int32
    layer: Optional[jnp.ndarray] = None,     # scalar; caches are [L, B, S, *]
    kv_heads: int,
    scale: Optional[float] = None,
    block: int = 0,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """One-token-per-row attention reading only ``[starts, ends)`` KV rows.

    Returns [B, Hq, D] in q.dtype.  With ``block_tables`` the caches are a
    shared paged pool ``[pool_tiles*block, Hkv*D]`` and tile j of row b
    lives at pool tile ``block_tables[b, j]``.  With ``layer`` the caches
    are the FULL per-layer stack ``[L, B, S, *]`` and this call reads layer
    ``layer`` — pass the standing buffer, never a slice of it (a sliced
    pallas operand materialises an HBM copy of the whole layer).
    """
    b, hq, d = q.shape
    f = k_cache.shape[-1]
    assert f == kv_heads * d, (f, kv_heads, d)
    assert hq % kv_heads == 0
    groups = hq // kv_heads
    paged = block_tables is not None
    stacked = layer is not None
    if paged:
        s = block_tables.shape[1]   # logical tiles; block set by caller
        assert block > 0, "paged mode requires an explicit block size"
        assert k_cache.ndim == (3 if stacked else 2), \
            "paged pool is [pool_rows, Hkv*D] (+ leading layer axis)"
    else:
        s = k_cache.shape[-2]
        assert k_cache.ndim == (4 if stacked else 3)
        if not block:
            block = _pick_block(s, row_bytes=f * k_cache.dtype.itemsize)
        assert s % block == 0, (s, block)
    if scale is None:
        scale = d ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    int8 = k_scale is not None
    if int8:
        assert v_scale is not None
    tables = (block_tables.astype(jnp.int32) if paged
              else jnp.zeros((b, 1), jnp.int32))   # dummy scalar operand
    layer_arr = (jnp.asarray(layer, jnp.int32).reshape(1) if stacked
                 else jnp.zeros((1,), jnp.int32))

    kernel = functools.partial(
        _decode_kernel,
        scale=float(scale), block=block, kv_heads=kv_heads, head_dim=d,
        q_groups=groups, paged=paged, int8=int8, stacked=stacked)

    # split the flat feature dim into [kv_heads, d] OUTSIDE the kernel: a
    # minor-dim row-major split is a free bitcast (the standing HBM buffer
    # stays the operand), and the kernel then needs no lane<->sublane
    # relayout after the DMA
    k_cache = k_cache.reshape(k_cache.shape[:-1] + (kv_heads, d))
    v_cache = v_cache.reshape(v_cache.shape[:-1] + (kv_heads, d))

    sdtype = k_scale.dtype if int8 else jnp.float32
    scratch = [
        pltpu.VMEM((2, block, kv_heads, d), k_cache.dtype),
        pltpu.VMEM((2, block, kv_heads, d), v_cache.dtype),
        pltpu.VMEM((2, block, kv_heads), sdtype),
        pltpu.VMEM((2, block, kv_heads), sdtype),
        pltpu.SemaphoreType.DMA((2, 4)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,          # starts, ends, tables, layer
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hq, d), lambda i, *_: (i, 0, 0)),  # q
            pl.BlockSpec(memory_space=pl.ANY),                  # k cache
            pl.BlockSpec(memory_space=pl.ANY),                  # v cache
            pl.BlockSpec(memory_space=pl.ANY),                  # k scales
            pl.BlockSpec(memory_space=pl.ANY),                  # v scales
        ],
        out_specs=pl.BlockSpec((1, hq, d), lambda i, *_: (i, 0, 0)),
        scratch_shapes=scratch,
    )
    ks = k_scale if int8 else jnp.zeros((1, 1, 1), jnp.float32)
    vs = v_scale if int8 else jnp.zeros((1, 1, 1), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hq, d), q.dtype),
        interpret=interpret,
    )(starts.astype(jnp.int32), ends.astype(jnp.int32), tables, layer_arr,
      q, k_cache, v_cache, ks, vs)
    return out
