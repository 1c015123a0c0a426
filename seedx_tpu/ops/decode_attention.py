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

Hardware status: the layout rules below came from on-chip Mosaic error
rounds EARLY in round 2, before the tunnel outage froze further TPU work
(NOTES_r2.md §OPEN); the kernel then shipped r2 interpret-validated only.
Round 3 closed that: it Mosaic-compiles and runs on the v5e
(scratch/tpu_ragged_smoke.py numerics parity; bench A/B 2026-08-18 —
B=8 decode 562 vs 361 tok/s (+56%), but B=1 72.5 vs 82.1, hence the
batch >= 2 "auto" cutoff in models/decode_stacked.py).

Kernel structure — shaped by those on-chip Mosaic rounds:
  * every vector value is rank <= 2 (the first round's ``[block, Hkv, G]``
    temporaries died on 3D reductions with singleton minor dims);
  * KV tiles are DMA'd as FULL contiguous rows ``[block, Hkv*D]`` of the
    position-major cache — per-head slices of that layout are NOT
    tile-aligned memref slices (second round: "slice shape along dimension
    2 must be aligned to tiling (8)"), and a head-major cache would
    force a layout change on every cache producer in the repo;
  * per-head score/value sums over the flat feature dim are SEGMENTED
    matmuls against constant 0/1 selector matrices built from 2D iota —
    ``(k*q) @ seg[F,Hkv]`` gives all heads' scores in one MXU op, and
    ``p @ exp[Hkv,F]`` broadcasts per-head softmax weights back to the
    flat layout for the value sum;
  * int8 KV scales apply in their position-major ``[block, W]`` layout
    because they factor out of the per-segment dots:
    ``sum_f k_int[t,f] q[f] * ks[t,h] = ks[t,h] * (k_int . q)[t,h]``;
  * every DMA'd minor dim must be a multiple of 128 (third on-chip round:
    "slice shape along dimension 2 must be aligned to tiling (128)"), so
    the head axis of masks/scales/softmax state is padded to
    ``W = roundup(Hkv, 128)`` and scale OPERANDS must be lane-padded to W
    — ``models/llama.py`` allocates its scale leaves pre-padded
    (``kv_scale_width``), and this wrapper pads unpadded callers (a copy,
    fine for tests; never hand the kernel an unpadded standing buffer).
    The pad lanes stay finite/zero end-to-end: seg/exp selector columns
    and rows for h >= Hkv are identically zero and ``valid`` masks them.

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
    dense rows (on TPU the page size must keep tile slices aligned:
    multiples of 32 for int8 caches, 16 for bf16, 8 for fp32);
  * optional ``layer`` scalar with ``[L, ...]`` stacked caches — the
    standing all-layer buffer is the pallas operand (slicing it outside
    would materialise an HBM copy per layer, NOTES_r2.md trap).

The flash-attention streaming-softmax update matches
``ops/flash_attention.py``; fully-masked rows produce zeros.
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

    row_bytes (one flat KV row's bytes) caps the tile so the
    double-buffered k+v scratch plus the kernel's fp32 [block, F]
    temporaries (4 bytes/elem regardless of cache dtype) stay well inside
    the ~16 MB VMEM: fp32 tile image <= ~2 MB."""
    b = preferred
    while b > 8 and row_bytes and b * row_bytes * 4 > 2 * 1024 * 1024:
        b //= 2
    while b > 1 and s % b:
        b //= 2
    return b


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _decode_kernel(starts_ref, ends_ref, tables_ref, layer_ref, q_ref,
                   k_hbm, v_hbm, ks_hbm, vs_hbm, o_ref,
                   k_buf, v_buf, ks_buf, vs_buf, sems, *,
                   scale: float, block: int, kv_heads: int, head_dim: int,
                   hkv_pad: int, q_groups: int, paged: bool, int8: bool,
                   stacked: bool, q_len: int = 1, s_limit: int = 0):
    """q_len > 1 = the MULTI-QUERY window mode (fused prefill+decode,
    inference/continuous.py): query slot i of row b sits at absolute
    position ends[b]-1+i and attends [starts[b], ends[b]+i) — a causal
    stair within the window.  Slots past the row's valid width read
    whatever the window allows and are discarded by the caller; per-query
    ends clamp to ``s_limit`` so the tile loop (and paged block-table
    lookups) never run past the logical cache."""
    b = pl.program_id(0)
    start = starts_ref[b]
    end = ends_ref[b]
    if q_len > 1:
        end_last = end + (q_len - 1)
        if s_limit:
            end_last = jnp.minimum(end_last, s_limit)
    else:
        end_last = end
    j0 = start // block
    j1 = pl.cdiv(end_last, block)
    f = kv_heads * head_dim

    def row_of(j):
        # physical first row of logical tile j: paged -> pool row from the
        # block table; dense -> the row's own tile j
        if paged:
            return tables_ref[b, j] * block
        return j * block

    def src_at(hbm, j):
        """[block, F] (caches) / [block, Hkv] (scales) slice of logical
        tile j for this row — full trailing dims, so every slice is
        tile-aligned in the position-major layout.

        stacked: hbm carries a leading layer axis (one standing buffer for
        ALL layers); paged: rows come from a shared pool addressed by the
        block table.  Combined stacked+paged is the paged
        continuous-serving layout."""
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

    # q pre-grouped outside to [G, F] (group g's heads flattened into the
    # cache's lane layout), pre-scaled
    q = q_ref[0].astype(jnp.float32) * scale

    # constant segment selectors from 2D iota (no transposes):
    # seg[f, h] = 1 iff lane f belongs to head h; exp = seg^T built
    # directly.  Pad lanes h >= kv_heads are all-zero columns/rows, so
    # nothing computed there ever reaches the output.
    w = hkv_pad
    seg = (jax.lax.broadcasted_iota(jnp.int32, (f, w), 0) // head_dim
           == jax.lax.broadcasted_iota(jnp.int32, (f, w), 1)
           ).astype(jnp.float32)
    expm = (jax.lax.broadcasted_iota(jnp.int32, (w, f), 1) // head_dim
            == jax.lax.broadcasted_iota(jnp.int32, (w, f), 0)
            ).astype(jnp.float32)

    def seg_dot(x, sel):
        # HIGHEST: multi-pass f32 MXU emulation — single-pass bf16 rounding
        # of the operands costs ~1e-3 absolute on the scores (measured on
        # chip), outside the kernel's exactness budget vs the XLA oracle
        return jax.lax.dot_general(x, sel, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)

    q_rows = q_len * q_groups

    def flash_update(m, l, acc, kc, vc, ksc, vsc, valid, q_r):
        """One streaming-softmax update of row state (m, l [1, W];
        acc [1, F]) against a KV chunk kc/vc [cc, F] (+int8 scales
        [cc, W]) under mask ``valid`` [cc, W]."""
        s = seg_dot(kc * q_r, seg)               # [cc, W]
        if int8:
            s = s * ksc                          # scales factor out
        s = jnp.where(valid, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=0, keepdims=True))
        # explicit guard: a fully-masked tile keeps m_new == NEG_INF
        # and exp(NEG_INF - NEG_INF) would be 1 — zero it instead
        p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
        alpha = jnp.where(m == NEG_INF, 0.0, jnp.exp(m - m_new))
        l = l * alpha + jnp.sum(p, axis=0, keepdims=True)
        if int8:
            p = p * vsc                          # v scales fold into p
        # broadcast per-head weights back to lanes, weight v, sum
        pv = jnp.sum(seg_dot(p, expm) * vc, axis=0, keepdims=True)
        acc = acc * seg_dot(alpha, expm) + pv    # [1, F]
        return m_new, l, acc

    def body(i, carry):
        ms, ls, accs = carry               # [G, Hkv], [G, Hkv], tuple of [1, F]
        j = j0 + i
        slot = jax.lax.rem(i, 2)

        @pl.when(j + 1 < j1)
        def _():
            start_tile(jax.lax.rem(i + 1, 2), j + 1)

        k_dma(slot, j).wait()
        v_dma(slot, j).wait()
        k = k_buf[slot].astype(jnp.float32)          # [block, F]
        v = v_buf[slot].astype(jnp.float32)
        if int8:
            ks_dma(slot, j).wait()
            vs_dma(slot, j).wait()
            ks = ks_buf[slot].astype(jnp.float32)    # [block, W]
            vs = vs_buf[slot].astype(jnp.float32)

        pos = j * block + jax.lax.broadcasted_iota(jnp.int32, (block, w), 0)
        head_ok = jax.lax.broadcasted_iota(jnp.int32, (block, w), 1) < kv_heads
        valid = (pos >= start) & head_ok & (pos < end)   # [block, W]

        new_ms, new_ls, new_accs = [], [], []
        for g in range(q_groups):
            m_new, l, acc = flash_update(
                ms[g:g + 1], ls[g:g + 1], accs[g], k, v,
                ks if int8 else None, vs if int8 else None,
                valid, q[g:g + 1])
            new_ms.append(m_new)
            new_ls.append(l)
            new_accs.append(acc)
        return (jnp.concatenate(new_ms, 0), jnp.concatenate(new_ls, 0),
                tuple(new_accs))

    def body_multi(i, carry):
        """Multi-query tile body.  VMEM discipline (the q_len == 1 body
        unrolled over window rows blows the ~16 MB scoped budget at 13B
        geometry — 19.9/24.1 MB measured on-chip): (a) the per-row flash
        update runs in a fori_loop with matmul one-hot row selection, so
        ONE set of [cc, F] fp32 temporaries exists regardless of q_len;
        (b) compute sub-chunks the DMA'd tile at ``cc <= 32`` rows so
        those temporaries stay ~0.65 MB at F=5120.  Row state lives in
        stacked carries (ms/ls [R, W], accs [R, F])."""
        ms, ls, accs = carry
        j = j0 + i
        slot = jax.lax.rem(i, 2)

        @pl.when(j + 1 < j1)
        def _():
            start_tile(jax.lax.rem(i + 1, 2), j + 1)

        k_dma(slot, j).wait()
        v_dma(slot, j).wait()
        if int8:
            ks_dma(slot, j).wait()
            vs_dma(slot, j).wait()

        cc = min(block, 32)
        for c0 in range(0, block, cc):
            kc = k_buf[slot, c0:c0 + cc].astype(jnp.float32)   # [cc, F]
            vc = v_buf[slot, c0:c0 + cc].astype(jnp.float32)
            ksc = ks_buf[slot, c0:c0 + cc].astype(jnp.float32) if int8 \
                else None
            vsc = vs_buf[slot, c0:c0 + cc].astype(jnp.float32) if int8 \
                else None
            pos = (j * block + c0
                   + jax.lax.broadcasted_iota(jnp.int32, (cc, w), 0))
            head_ok = (jax.lax.broadcasted_iota(jnp.int32, (cc, w), 1)
                       < kv_heads)
            base_ok = (pos >= start) & head_ok               # [cc, W]

            def qbody(r, st, base_ok=base_ok, pos=pos, kc=kc, vc=vc,
                      ksc=ksc, vsc=vsc):
                ms, ls, accs = st
                # one-hot row selection via MXU — exact (0/1 weights pick
                # a single f32 element per output lane), and it avoids
                # dynamic sublane slicing, which Mosaic restricts
                onehot = (jax.lax.broadcasted_iota(
                    jnp.int32, (1, q_rows), 1) == r).astype(jnp.float32)
                sel = lambda mat: jax.lax.dot_general(
                    onehot, mat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                # multi-query stair: window row r = query slot r//G of
                # group r%G, attending [start, end + r//G)
                e_i = end + r // q_groups
                if s_limit:
                    e_i = jnp.minimum(e_i, s_limit)
                valid = base_ok & (pos < e_i)
                m_new, l, acc = flash_update(
                    sel(ms), sel(ls), sel(accs), kc, vc, ksc, vsc,
                    valid, sel(qf))
                rmask_w = (jax.lax.broadcasted_iota(
                    jnp.int32, (q_rows, w), 0) == r)
                rmask_f = (jax.lax.broadcasted_iota(
                    jnp.int32, (q_rows, f), 0) == r)
                ms = jnp.where(rmask_w, jnp.broadcast_to(m_new, ms.shape),
                               ms)
                ls = jnp.where(rmask_w, jnp.broadcast_to(l, ls.shape), ls)
                accs = jnp.where(rmask_f, jnp.broadcast_to(acc, accs.shape),
                                 accs)
                return ms, ls, accs

            ms, ls, accs = jax.lax.fori_loop(0, q_rows, qbody,
                                             (ms, ls, accs))
        return ms, ls, accs

    if q_len == 1:
        init = (jnp.full((q_rows, w), NEG_INF, jnp.float32),
                jnp.zeros((q_rows, w), jnp.float32),
                tuple(jnp.zeros((1, f), jnp.float32) for _ in range(q_rows)))
        ms, ls, accs = jax.lax.fori_loop(0, j1 - j0, body, init)
        accs = list(accs)
    else:
        qf = q                      # [q_rows, F], pre-scaled fp32
        init = (jnp.full((q_rows, w), NEG_INF, jnp.float32),
                jnp.zeros((q_rows, w), jnp.float32),
                jnp.zeros((q_rows, f), jnp.float32))
        ms, ls, accs = jax.lax.fori_loop(0, j1 - j0, body_multi, init)
        accs = [accs[r:r + 1] for r in range(q_rows)]

    inv_l = 1.0 / jnp.maximum(ls, 1e-30)             # [q_rows, W]
    for r in range(q_rows):
        out = accs[r] * seg_dot(inv_l[r:r + 1], expm)
        o_ref[0, r] = out[0].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block", "kv_heads", "interpret"))
def ragged_decode_attention(
    q: jnp.ndarray,                 # [B, Hq, D] or [B, w, Hq, D]
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

    MULTI-QUERY window mode (the continuous engine's fused prefill+decode
    step): ``q`` of shape [B, w, Hq, D] — window query slot i of row b sits
    at absolute position ``ends[b]-1+i`` and attends ``[starts[b],
    ends[b]+i)``, the causal stair over tokens the fused step just wrote.
    Returns [B, w, Hq, D].  Slots past a row's valid width compute over
    the stair-extended (garbage but finite) window; the caller discards
    them.  Per-query ends clamp to the cache's logical length so paged
    block-table lookups stay in range.
    """
    if q.ndim == 4:
        b, q_len, hq, d = q.shape
        multi = True
    else:
        b, hq, d = q.shape
        q_len, multi = 1, False
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
    hkv_pad = _round_up(kv_heads, 128)
    if not interpret:
        # Mosaic memref-slice tiling rules (measured on chip): DMA'd minor
        # dims must be 128-multiples, sliced sublane extents must be
        # multiples of the dtype's sublane granule.
        granule = {1: 32, 2: 16, 4: 8}[k_cache.dtype.itemsize]
        assert f % 128 == 0, \
            f"TPU ragged decode needs kv_heads*head_dim % 128 == 0, got {f}"
        assert block % granule == 0, \
            f"tile {block} not a multiple of the {k_cache.dtype} granule"
    if int8:
        # scale operands must be lane-padded to hkv_pad; standing buffers
        # from models/llama.py already are (kv_scale_width), direct callers
        # with [.., Hkv] scales get padded here (copies — test-path only)
        def _pad(sc):
            short = hkv_pad - sc.shape[-1]
            if short == 0:
                return sc
            assert short > 0, (sc.shape, hkv_pad)
            return jnp.pad(sc, [(0, 0)] * (sc.ndim - 1) + [(0, short)])

        k_scale = _pad(k_scale)
        v_scale = _pad(v_scale)
    tables = (block_tables.astype(jnp.int32) if paged
              else jnp.zeros((b, 1), jnp.int32))   # dummy scalar operand
    layer_arr = (jnp.asarray(layer, jnp.int32).reshape(1) if stacked
                 else jnp.zeros((1,), jnp.int32))

    # the multi-query stair may step past the logical length; clamp there
    s_limit = (block_tables.shape[1] * block if paged else s) if multi else 0

    kernel = functools.partial(
        _decode_kernel,
        scale=float(scale), block=block, kv_heads=kv_heads, head_dim=d,
        hkv_pad=hkv_pad, q_groups=groups, paged=paged, int8=int8,
        stacked=stacked, q_len=q_len, s_limit=s_limit)

    # q regrouped OUTSIDE to [B, q_len*G, Hkv*D]: group g's slice
    # lane-matches the flat cache rows (head h of group g lives at lanes
    # [h*D, (h+1)*D)) — the kernel then runs rank-2 segmented ops only.
    # q is tiny, so this transpose costs nothing per step.
    q_rows = q_len * groups
    qg = q.reshape(b, q_len, kv_heads, groups, d
                   ).transpose(0, 1, 3, 2, 4).reshape(b, q_rows, f)

    sdtype = k_scale.dtype if int8 else jnp.float32
    scratch = [
        pltpu.VMEM((2, block, f), k_cache.dtype),
        pltpu.VMEM((2, block, f), v_cache.dtype),
        pltpu.VMEM((2, block, hkv_pad), sdtype),
        pltpu.VMEM((2, block, hkv_pad), sdtype),
        pltpu.SemaphoreType.DMA((2, 4)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,          # starts, ends, tables, layer
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, q_rows, f), lambda i, *_: (i, 0, 0)),  # q
            pl.BlockSpec(memory_space=pl.ANY),                  # k cache
            pl.BlockSpec(memory_space=pl.ANY),                  # v cache
            pl.BlockSpec(memory_space=pl.ANY),                  # k scales
            pl.BlockSpec(memory_space=pl.ANY),                  # v scales
        ],
        out_specs=pl.BlockSpec((1, q_rows, f), lambda i, *_: (i, 0, 0)),
        scratch_shapes=scratch,
    )
    ks = k_scale if int8 else jnp.zeros((1, 1, 1), jnp.float32)
    vs = v_scale if int8 else jnp.zeros((1, 1, 1), jnp.float32)
    # multi-query mode: body_multi's fori_loop + sub-chunking bound the
    # stack, but at 13B geometry (F=5120) the selector constants + fp32
    # chunk temporaries still sit just above the 16 MB DEFAULT scoped-vmem
    # budget (16.82 MB measured on v5e) — raise the scoped limit toward
    # the 128 MiB physical VMEM for this mode only; the validated
    # single-query config keeps the default pipeline/stack split.
    cparams = dict(dimension_semantics=("arbitrary",))
    if q_len > 1:
        cparams["vmem_limit_bytes"] = 64 * 1024 * 1024
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, q_rows, f), q.dtype),
        compiler_params=pltpu.CompilerParams(**cparams),
        interpret=interpret,
    )(starts.astype(jnp.int32), ends.astype(jnp.int32), tables, layer_arr,
      qg, k_cache, v_cache, ks, vs)
    out = out.reshape(b, q_len, groups, kv_heads, d
                      ).transpose(0, 1, 3, 2, 4).reshape(b, q_len, hq, d)
    return out if multi else out[:, 0]
