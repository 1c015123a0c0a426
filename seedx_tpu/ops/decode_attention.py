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

Kernel structure — shaped by those on-chip Mosaic rounds (v1) and the r4
multi-query redesign (v3):
  * every vector value is rank <= 2 (the first round's ``[block, Hkv, G]``
    temporaries died on 3D reductions with singleton minor dims);
  * KV tiles are DMA'd as FULL contiguous rows ``[block, Hkv*D]`` of the
    position-major cache — per-head slices of that layout are NOT
    tile-aligned memref slices (second round: "slice shape along dimension
    2 must be aligned to tiling (8)"), and a head-major cache would
    force a layout change on every cache producer in the repo;
  * scores are ONE single-pass bf16 MXU matmul per tile against an
    in-kernel scatter matrix ``Q [F, C]`` (C = q_rows*W) whose column
    r*W+h holds query row r masked to head h's lanes.  The cache (bf16,
    or int8 — exact in bf16) and q are RAW bf16 values, so bf16 operands
    with f32 MXU accumulation give the same exact products the original
    f32-HIGHEST segmented-matmul emulation computed, at ~1/6 the passes
    and with all window rows sharing one op.  The 1/sqrt(D) scale applies
    AFTER the matmul, so q is never pre-rounded.  (v1 computed per-head
    scores as ``(k*q_r) @ seg[F,W]`` per window row in f32 HIGHEST —
    measured on-chip that multiplied attention compute by ~q_len and sank
    fused serving 3.6x, NOTES_r4.md);
  * ``p_r @ exp[W,F]`` broadcasts per-head softmax weights back to the
    flat layout for the value sum (bf16 p operand: <= 2^-9 relative on
    post-softmax weights); the M=1 alpha/inv_l accumulator rescales stay
    f32-HIGHEST so per-tile rounding never compounds;
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

    # ---- v3 compute structure (bf16-operand MXU, one body for all q_len)
    #
    # The v1/v2 design computed per-head scores as f32-HIGHEST segmented
    # matmuls over k*q PRODUCTS — correct, but (a) the dense selector
    # wastes ~W/1 FLOPs per head, (b) HIGHEST costs ~6 MXU passes to
    # emulate f32, and (c) the multi-query window multiplied all of it by
    # q_len (measured on-chip: fused serving sank to 71.9 tok/s vs 261.9).
    # Key numerics fact: the cache (bf16, or int8 which converts to bf16
    # EXACTLY) and q (bf16) are raw bf16 values, so a single-pass bf16
    # matmul with f32 MXU accumulation computes the same exact products
    # the HIGHEST emulation did — no operand rounding exists to avoid.
    # Scores therefore come from ONE native matmul against a scatter
    # matrix Q [F, C], C = q_rows*W, whose column r*W+h holds q row r
    # masked to head h's lanes (built in-kernel from constants + qT; the
    # 1/sqrt(D) scale applies AFTER the matmul so q is never pre-rounded).
    # Softmax state is a flat [1, C] vector; only the value broadcast
    # (p_r @ expm, operand p rounded bf16, <= 2^-9 relative on the
    # post-softmax weights) and the alpha/inv_l rescales stay per-row.
    w = hkv_pad
    q_rows = q_len * q_groups
    c_cols = q_rows * w

    # constant selectors from 2D iota (no transposes):
    # seg16[f, h] = 1 iff lane f belongs to head h (bf16, exact 0/1);
    # expm broadcasts per-head [.., W] vectors back to the flat lane
    # layout.  Pad lanes h >= kv_heads are all-zero columns/rows.
    seg16 = (jax.lax.broadcasted_iota(jnp.int32, (f, w), 0) // head_dim
             == jax.lax.broadcasted_iota(jnp.int32, (f, w), 1)
             ).astype(jnp.bfloat16)
    expm16 = (jax.lax.broadcasted_iota(jnp.int32, (w, f), 1) // head_dim
              == jax.lax.broadcasted_iota(jnp.int32, (w, f), 0)
              ).astype(jnp.bfloat16)
    expm32 = expm16.astype(jnp.float32)

    def dot16(a, sel):
        """Native single-pass bf16 MXU dot with f32 accumulation."""
        return jax.lax.dot_general(a, sel, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def dot32(a, sel):
        # HIGHEST f32: for the M=1 alpha/inv_l rescale broadcasts, where
        # repeated per-tile rounding of the accumulator scale would
        # compound; cost is negligible at M=1
        return jax.lax.dot_general(a, sel, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)

    # Q [F, C] bf16: column r*W+h = q[r] masked to head h's lanes.  Built
    # per row via a tiny selector matmul (qcol = qT @ onehot_r broadcast,
    # values copied exactly) then masked by seg16; concatenated along
    # lanes (128-aligned pieces).  No dynamic slicing anywhere.
    qt = q_ref[0].astype(jnp.bfloat16)            # [F, q_rows], raw bf16
    q_cols = []
    for r in range(q_rows):
        sel_r = (jax.lax.broadcasted_iota(jnp.int32, (q_rows, w), 0) == r
                 ).astype(jnp.bfloat16)
        qcol = dot16(qt, sel_r).astype(jnp.bfloat16)   # [F, W], exact copy
        q_cols.append(qcol * seg16)
    q_mat = jnp.concatenate(q_cols, axis=1) if q_rows > 1 else q_cols[0]

    # int8 scale tiling [W] -> [C]: tile16[h, r*W+h'] = (h == h')
    if int8 and q_rows > 1:
        tile16 = (jax.lax.broadcasted_iota(jnp.int32, (w, c_cols), 0)
                  == jax.lax.broadcasted_iota(jnp.int32, (w, c_cols), 1) % w
                  ).astype(jnp.bfloat16)

    # column decode for masks: col c -> window row r = c // W (query slot
    # qi = r // G), head h = c % W
    col_qi = (jax.lax.broadcasted_iota(jnp.int32, (block, c_cols), 1)
              // w) // q_groups
    col_head_ok = (jax.lax.broadcasted_iota(jnp.int32, (block, c_cols), 1)
                   % w < kv_heads)

    def body(i, carry):
        ms, ls, accs = carry        # [1, C], [1, C], tuple of q_rows [1, F]
        j = j0 + i
        slot = jax.lax.rem(i, 2)

        @pl.when(j + 1 < j1)
        def _():
            start_tile(jax.lax.rem(i + 1, 2), j + 1)

        k_dma(slot, j).wait()
        v_dma(slot, j).wait()
        k16 = k_buf[slot].astype(jnp.bfloat16)       # [block, F] (int8 exact)
        v32 = v_buf[slot].astype(jnp.float32)
        if int8:
            ks_dma(slot, j).wait()
            vs_dma(slot, j).wait()
            ks16 = ks_buf[slot].astype(jnp.bfloat16)   # [block, W]
            vs32 = vs_buf[slot].astype(jnp.float32)

        s = dot16(k16, q_mat) * scale                # [block, C] f32
        if int8:
            # k scales factor out of the per-head dots; selection matmul
            # places each bf16 scale exactly
            ks_rep = dot16(ks16, tile16) if q_rows > 1 else \
                ks16.astype(jnp.float32)
            s = s * ks_rep

        pos = j * block + jax.lax.broadcasted_iota(
            jnp.int32, (block, c_cols), 0)
        # multi-query stair: window query slot qi attends [start, end+qi),
        # clamped to the logical cache length
        e_c = end + col_qi
        if q_len > 1 and s_limit:
            e_c = jnp.minimum(e_c, s_limit)
        valid = (pos >= start) & col_head_ok & (pos < e_c)   # [block, C]
        s = jnp.where(valid, s, NEG_INF)

        m_new = jnp.maximum(ms, jnp.max(s, axis=0, keepdims=True))
        # explicit guard: a fully-masked tile keeps m_new == NEG_INF and
        # exp(NEG_INF - NEG_INF) would be 1 — zero it instead
        p = jnp.where(valid, jnp.exp(s - m_new), 0.0)        # [block, C]
        alpha = jnp.where(ms == NEG_INF, 0.0, jnp.exp(ms - m_new))
        ls = ls * alpha + jnp.sum(p, axis=0, keepdims=True)

        new_accs = []
        for r in range(q_rows):
            p_r = p[:, r * w:(r + 1) * w]            # static aligned slice
            if int8:
                p_r = p_r * vs32                     # v scales fold into p
            # broadcast per-head weights back to lanes (bf16 p: <= 2^-9
            # relative on post-softmax weights), weight v, sum over block
            p_brd = dot16(p_r.astype(jnp.bfloat16), expm16)
            pv = jnp.sum(p_brd * v32, axis=0, keepdims=True)
            a_brd = dot32(alpha[:, r * w:(r + 1) * w], expm32)
            new_accs.append(accs[r] * a_brd + pv)    # [1, F]
        return m_new, ls, tuple(new_accs)

    init = (jnp.full((1, c_cols), NEG_INF, jnp.float32),
            jnp.zeros((1, c_cols), jnp.float32),
            tuple(jnp.zeros((1, f), jnp.float32) for _ in range(q_rows)))
    ms, ls, accs = jax.lax.fori_loop(0, j1 - j0, body, init)

    inv_l = 1.0 / jnp.maximum(ls, 1e-30)             # [1, C]
    for r in range(q_rows):
        out = accs[r] * dot32(inv_l[:, r * w:(r + 1) * w], expm32)
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

    # q regrouped OUTSIDE to [B, Hkv*D, q_len*G] (transposed): row r of the
    # window covers all heads in the flat cache lane layout (head h of
    # group g lives at lanes [h*D, (h+1)*D)); the kernel builds its scatter
    # matrix Q [F, C] from this qT with constant selector matmuls only.
    # q is tiny, so this transpose costs nothing per step.
    q_rows = q_len * groups
    qg = q.reshape(b, q_len, kv_heads, groups, d
                   ).transpose(0, 1, 3, 2, 4).reshape(b, q_rows, f)
    qt = qg.transpose(0, 2, 1)                       # [B, F, q_rows]

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
            pl.BlockSpec((1, f, q_rows), lambda i, *_: (i, 0, 0)),  # qT
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
    # the kernel's stack peaks around Q [F, C] bf16 plus per-row [block, F]
    # f32 value temporaries — ~15 MB at 13B single-query and ~45 MB at the
    # w=16 window, above the 16 MB DEFAULT scoped-vmem budget (the v5e has
    # 128 MiB physical VMEM); our large operands are manual-DMA'd (ANY
    # memspace), so raising the scoped limit costs the pipeline nothing
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, q_rows, f), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(starts.astype(jnp.int32), ends.astype(jnp.int32), tables, layer_arr,
      qt, k_cache, v_cache, ks, vs)
    out = out.reshape(b, q_len, groups, kv_heads, d
                      ).transpose(0, 1, 3, 2, 4).reshape(b, q_len, hq, d)
    return out if multi else out[:, 0]
