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
  * backward pass = flash-2 Pallas kernels (dq grid over q blocks; dk/dv grid
    over k blocks) recomputing probabilities from the saved per-row logsumexp
    — the XLA vjp would materialise the [B, H, S, S] fp32 probs in HBM twice,
  * forward AND backward are SPMD-partitionable over (batch, heads) via
    ``custom_partitioning`` + shardy rules, so TP/FSDP-sharded callers run
    the kernels per-shard with no all-gather and no fallback.

Written blockwise so a context-parallel axis can be layered on later
(SURVEY.md §5 long-context note).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec

from seedx_tpu.ops.attention import NEG_INF

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256


def _flash_fwd_kernel(starts_ref, ends_ref, qoff_ref, q_ref, k_ref, v_ref,
                      o_ref, lse_ref, *, scale: float, causal: bool,
                      block_k: int, kv_len: int):
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
        # Rows fully masked so far have m_new == NEG_INF; exp(s - m_new)
        # would be exp(0) = 1 for every masked cell (garbage l and output),
        # so zero p explicitly (matches the backward kernels' explicit mask).
        p = jnp.where(m_new[:, None] == NEG_INF, 0.0,
                      jnp.exp(s - m_new[:, None]))
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
    # Fully-masked rows (query beyond length, or left-padded rows whose tile
    # keeps the k-loop running for other rows) produce l == 0; emit zeros.
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[:] = (acc / l_safe[:, None]).astype(o_ref.dtype)
    # logsumexp rows, saved for the Pallas backward (p = exp(s - lse));
    # fully-masked rows keep lse = NEG_INF so recomputed p stays 0 there.
    # Tile is [1, block_q]: Mosaic requires >=2-D blocks with an (8,128)- or
    # full-dim-aligned tail, so lse rides a size-1 sublane dim end-to-end.
    lse_ref[:] = (m + jnp.log(l_safe))[None, :]


def _flash_forward_local(q, k, v, starts, ends, q_offset, causal, scale,
                         block_q, block_k, interpret):
    """One-shard pallas_call; q/k/v are the shapes this device actually owns."""
    b, q_len, heads, head_dim = q.shape
    kv_len = k.shape[1]

    # [b, s, h, d] -> [b, h, s, d] for contiguous per-head tiles.
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)

    grid = (b, heads, q_len // block_q)
    kernel = functools.partial(
        _flash_fwd_kernel, scale=scale, causal=causal,
        block_k=block_k, kv_len=kv_len,
    )
    out, lse = pl.pallas_call(
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
            out_specs=[
                pl.BlockSpec((None, None, block_q, head_dim),
                             lambda ib, ih, iq, *_: (ib, ih, iq, 0)),
                pl.BlockSpec((None, None, 1, block_q),
                             lambda ib, ih, iq, *_: (ib, ih, 0, iq)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(qt.shape, q.dtype),
            jax.ShapeDtypeStruct((b, heads, 1, q_len), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * q_len * kv_len * head_dim,
            bytes_accessed=(qt.size + kt.size + vt.size) * qt.dtype.itemsize,
            transcendentals=b * heads * q_len * kv_len,
        ),
        interpret=interpret,
    )(starts.astype(jnp.int32), ends.astype(jnp.int32), q_offset, qt, kt, vt)
    return jnp.swapaxes(out, 1, 2), lse


# ---- SPMD partitioning ------------------------------------------------------
#
# A pallas_call is opaque to the GSPMD/shardy partitioner, so without help a
# sharded caller (TP inference: heads on the `tensor` axis, batch on
# `data`/`fsdp` — seedx_tpu/parallel/mesh.py) would all-gather q/k/v onto
# every device and run the full kernel redundantly.  The grid is embarrassingly
# parallel over (batch, heads), so custom_partitioning declares exactly that:
# batch/head dims may shard, seq + head_dim are marked need-replication, and
# each shard runs the kernel on its local block.  No collectives are needed.
# (The reference replicates its whole 17B stack per GPU and xformers never
# sees a sharded tensor; this is the TPU-native upgrade path.)

@functools.partial(custom_partitioning, static_argnums=(6, 7, 8, 9, 10))
def _flash_forward_p(q, k, v, starts, ends, q_offset, causal, scale, block_q,
                     block_k, interpret):
    return _flash_forward_local(q, k, v, starts, ends, q_offset, causal,
                                scale, block_q, block_k, interpret)


def _spec_entry(named_sharding, dim):
    spec = named_sharding.spec
    return spec[dim] if dim < len(spec) else None


def _flash_partition(causal, scale, block_q, block_k, interpret, mesh,
                     arg_shapes, result_shape):
    bspec = _spec_entry(result_shape[0].sharding, 0)
    hspec = _spec_entry(result_shape[0].sharding, 2)
    qkv = NamedSharding(mesh, PartitionSpec(bspec, None, hspec, None))
    vec = NamedSharding(mesh, PartitionSpec(bspec))
    rep = NamedSharding(mesh, PartitionSpec(None))
    arg_shardings = (qkv, qkv, qkv, vec, vec, rep)
    out_shardings = (
        NamedSharding(mesh, PartitionSpec(bspec, None, hspec, None)),
        NamedSharding(mesh, PartitionSpec(bspec, hspec, None, None)),
    )

    def lower_fn(q, k, v, starts, ends, q_offset):
        return _flash_forward_local(q, k, v, starts, ends, q_offset, causal,
                                    scale, block_q, block_k, interpret)

    return mesh, lower_fn, out_shardings, arg_shardings


def _flash_infer_sharding(causal, scale, block_q, block_k, interpret, mesh,
                          arg_shapes, result_shape):
    bspec = _spec_entry(arg_shapes[0].sharding, 0)
    hspec = _spec_entry(arg_shapes[0].sharding, 2)
    return (NamedSharding(mesh, PartitionSpec(bspec, None, hspec, None)),
            NamedSharding(mesh, PartitionSpec(bspec, hspec, None, None)))


_flash_forward_p.def_partition(
    partition=_flash_partition,
    infer_sharding_from_operands=_flash_infer_sharding,
    # shardy rule: batch (b) and heads (h) may shard; q/k seq, head_dim and
    # the q_offset scalar must be replicated.
    sharding_rule="b q h d, b k h d, b k h d, b, b, o -> b q h d, b h e q",
    # factor order = first appearance in the rule (q, d before k, o, e)
    need_replication_factors=("q", "d", "k", "o", "e"),
)


def _flash_forward(q, k, v, starts, ends, q_offset, causal, scale, block_q,
                   block_k):
    interpret = jax.default_backend() != "tpu"
    return _flash_forward_p(q, k, v, starts, ends, q_offset, causal, scale,
                            block_q, block_k, interpret)


# ---- backward kernels --------------------------------------------------------
#
# Flash-attention-2 backward: the forward saves per-row logsumexp; the
# backward recomputes the probabilities blockwise from (q, k, lse) instead of
# materialising the [B, H, S, S] fp32 probs the XLA vjp writes to HBM.
# delta = rowsum(dO * O) is a cheap XLA reduction outside the kernels.
# Split into a dq kernel (grid over q blocks) and a dk/dv kernel (grid over
# k blocks) so every output tile has a single writer — no atomics on TPU.

def _flash_bwd_dq_kernel(starts_ref, ends_ref, qoff_ref, q_ref, k_ref, v_ref,
                         do_ref, lse_ref, delta_ref, dq_ref, *, scale: float,
                         causal: bool, block_k: int):
    block_q, head_dim = q_ref.shape
    iq = pl.program_id(2)
    b = pl.program_id(0)
    q_offset = qoff_ref[0]
    start = starts_ref[b]
    end = ends_ref[b]
    first_k = start // block_k
    num_k_by_len = pl.cdiv(end, block_k)
    if causal:
        num_k = jnp.minimum(num_k_by_len,
                            pl.cdiv(q_offset + (iq + 1) * block_q, block_k))
    else:
        num_k = num_k_by_len

    q = q_ref[:].astype(jnp.float32)
    do = do_ref[:].astype(jnp.float32)
    lse = lse_ref[0, :]
    delta = delta_ref[0, :]
    q_pos = q_offset + iq * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0)

    def body(j, dq_acc):
        k_tile = k_ref[pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v_tile = v_ref[pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_tile, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        k_pos = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        mask = jnp.logical_and(k_pos >= start, k_pos < end)
        if causal:
            mask = jnp.logical_and(mask, q_pos >= k_pos)
        # explicit mask (NOT bias): masked rows have lse == NEG_INF and
        # s == NEG_INF, and exp(s - lse) would be 1 there.
        p = jnp.where(mask, jnp.exp(s - lse[:, None]), 0.0)
        dp = jax.lax.dot_general(
            do, v_tile, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta[:, None]) * scale
        return dq_acc + jax.lax.dot_general(
            ds, k_tile, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(first_k, num_k,
                           body, jnp.zeros((block_q, head_dim), jnp.float32))
    dq_ref[:] = dq.astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(starts_ref, ends_ref, qoff_ref, q_ref, k_ref, v_ref,
                          do_ref, lse_ref, delta_ref, dk_ref, dv_ref, *,
                          scale: float, causal: bool, block_q: int):
    block_k, head_dim = k_ref.shape
    q_len = q_ref.shape[0]
    ik = pl.program_id(2)
    b = pl.program_id(0)
    q_offset = qoff_ref[0]
    start = starts_ref[b]
    end = ends_ref[b]
    kc = ik * block_k

    n_q = q_len // block_q
    if causal:
        # first q row that can see this k tile: q_offset + row >= kc
        first_q = jnp.maximum(kc - q_offset, 0) // block_q
    else:
        first_q = 0

    k_t = k_ref[:].astype(jnp.float32)
    v_t = v_ref[:].astype(jnp.float32)
    k_pos = kc + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    k_valid = jnp.logical_and(k_pos >= start, k_pos < end)

    def body(i, carry):
        dk_acc, dv_acc = carry
        q_i = q_ref[pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        do_i = do_ref[pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse_i = lse_ref[0, pl.ds(i * block_q, block_q)]
        delta_i = delta_ref[0, pl.ds(i * block_q, block_q)]
        s = jax.lax.dot_general(
            q_i, k_t, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        mask = k_valid
        if causal:
            q_pos = q_offset + i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            mask = jnp.logical_and(mask, q_pos >= k_pos)
        p = jnp.where(mask, jnp.exp(s - lse_i[:, None]), 0.0)
        dv_new = dv_acc + jax.lax.dot_general(
            p, do_i, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do_i, v_t, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta_i[:, None]) * scale
        dk_new = dk_acc + jax.lax.dot_general(
            ds, q_i, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk_new, dv_new

    zeros = jnp.zeros((block_k, head_dim), jnp.float32)
    dk, dv = jax.lax.fori_loop(first_q, n_q, body, (zeros, zeros))
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _flash_backward_local(q, k, v, do, lse, delta, starts, ends, q_offset,
                          causal, scale, block_q, block_k, interpret):
    b, q_len, heads, head_dim = q.shape
    kv_len = k.shape[1]
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    dot = jnp.swapaxes(do, 1, 2)
    scalars = (starts, ends, q_offset)

    qspec = pl.BlockSpec((None, None, block_q, head_dim),
                         lambda ib, ih, i, *_: (ib, ih, i, 0))
    qfull = pl.BlockSpec((None, None, q_len, head_dim),
                         lambda ib, ih, i, *_: (ib, ih, 0, 0))
    kfull = pl.BlockSpec((None, None, kv_len, head_dim),
                         lambda ib, ih, i, *_: (ib, ih, 0, 0))
    kspec = pl.BlockSpec((None, None, block_k, head_dim),
                         lambda ib, ih, i, *_: (ib, ih, i, 0))
    rblock = pl.BlockSpec((None, None, 1, block_q),
                          lambda ib, ih, i, *_: (ib, ih, 0, i))
    rfull = pl.BlockSpec((None, None, 1, q_len),
                         lambda ib, ih, i, *_: (ib, ih, 0, 0))

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, causal=causal,
                          block_k=block_k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, heads, q_len // block_q),
            in_specs=[qspec, kfull, kfull, qspec, rblock, rblock],
            out_specs=qspec,
        ),
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=5 * b * heads * q_len * kv_len * head_dim,
            bytes_accessed=2 * (qt.size + kt.size + vt.size)
            * qt.dtype.itemsize,
            transcendentals=b * heads * q_len * kv_len,
        ),
        interpret=interpret,
    )(*scalars, qt, kt, vt, dot, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, causal=causal,
                          block_q=block_q),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, heads, kv_len // block_k),
            in_specs=[qfull, kspec, kspec, qfull, rfull, rfull],
            out_specs=[kspec, kspec],
        ),
        out_shape=[jax.ShapeDtypeStruct(kt.shape, k.dtype),
                   jax.ShapeDtypeStruct(vt.shape, v.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=5 * b * heads * q_len * kv_len * head_dim,
            bytes_accessed=2 * (qt.size + kt.size + vt.size)
            * qt.dtype.itemsize,
            transcendentals=b * heads * q_len * kv_len,
        ),
        interpret=interpret,
    )(*scalars, qt, kt, vt, dot, lse, delta)
    return (jnp.swapaxes(dq, 1, 2), jnp.swapaxes(dk, 1, 2),
            jnp.swapaxes(dv, 1, 2))


@functools.partial(custom_partitioning, static_argnums=(9, 10, 11, 12, 13))
def _flash_backward_p(q, k, v, do, lse, delta, starts, ends, q_offset, causal,
                      scale, block_q, block_k, interpret):
    return _flash_backward_local(q, k, v, do, lse, delta, starts, ends,
                                 q_offset, causal, scale, block_q, block_k,
                                 interpret)


def _flash_bwd_partition(causal, scale, block_q, block_k, interpret, mesh,
                         arg_shapes, result_shape):
    bspec = _spec_entry(result_shape[0].sharding, 0)
    hspec = _spec_entry(result_shape[0].sharding, 2)
    qkv = NamedSharding(mesh, PartitionSpec(bspec, None, hspec, None))
    row = NamedSharding(mesh, PartitionSpec(bspec, hspec, None, None))
    vec = NamedSharding(mesh, PartitionSpec(bspec))
    rep = NamedSharding(mesh, PartitionSpec(None))
    arg_shardings = (qkv, qkv, qkv, qkv, row, row, vec, vec, rep)
    out_shardings = (qkv, qkv, qkv)

    def lower_fn(q, k, v, do, lse, delta, starts, ends, q_offset):
        return _flash_backward_local(q, k, v, do, lse, delta, starts, ends,
                                     q_offset, causal, scale, block_q,
                                     block_k, interpret)

    return mesh, lower_fn, out_shardings, arg_shardings


def _flash_bwd_infer_sharding(causal, scale, block_q, block_k, interpret,
                              mesh, arg_shapes, result_shape):
    bspec = _spec_entry(arg_shapes[0].sharding, 0)
    hspec = _spec_entry(arg_shapes[0].sharding, 2)
    qkv = NamedSharding(mesh, PartitionSpec(bspec, None, hspec, None))
    return (qkv, qkv, qkv)


_flash_backward_p.def_partition(
    partition=_flash_bwd_partition,
    infer_sharding_from_operands=_flash_bwd_infer_sharding,
    sharding_rule=("b q h d, b k h d, b k h d, b q h d, b h e q, b h e q, "
                   "b, b, o -> b q h d, b k h d, b k h d"),
    need_replication_factors=("q", "d", "k", "o"),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _flash(q, k, v, starts, ends, q_offset, causal, scale, block_q, block_k):
    out, _ = _flash_forward(q, k, v, starts, ends, q_offset, causal, scale,
                            block_q, block_k)
    return out


def _flash_fwd(q, k, v, starts, ends, q_offset, causal, scale, block_q,
               block_k):
    out, lse = _flash_forward(q, k, v, starts, ends, q_offset, causal, scale,
                              block_q, block_k)
    return out, (q, k, v, out, lse, starts, ends, q_offset)


def _flash_bwd(causal, scale, block_q, block_k, residuals, g):
    q, k, v, out, lse, starts, ends, q_offset = residuals
    # delta_i = rowsum(dO_i * O_i): cheap elementwise XLA reduction
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = jnp.swapaxes(delta, 1, 2)[:, :, None, :]  # [b, h, 1, q]
    interpret = jax.default_backend() != "tpu"
    dq, dk, dv = _flash_backward_p(q, k, v, g.astype(q.dtype), lse, delta,
                                   starts, ends, q_offset, causal, scale,
                                   block_q, block_k, interpret)
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

    b, q_len, _, _ = q.shape
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
    starts = (jnp.zeros((b,), jnp.int32) if starts is None
              else jnp.asarray(starts, jnp.int32))
    ends = (jnp.full((b,), kv_len, jnp.int32) if ends is None
            else jnp.asarray(ends, jnp.int32))
    if q_offset is None:
        q_offset = kv_len - q_len
    q_offset = jnp.asarray(q_offset, jnp.int32).reshape(1)
    return _flash(q, k, v, starts, ends, q_offset, causal, scale, block_q,
                  block_k)
