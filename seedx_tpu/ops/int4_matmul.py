"""Pallas int4 weight-only matmul (serving decode path).

Decode is HBM-bandwidth bound: every generated token streams the full weight
matrix once.  int8 weight-only (utils/quantize.py) halves that stream; this
kernel halves it again.  XLA cannot do this on its own — a jnp dequant of a
nibble-packed operand materialises the full bf16 weight matrix in HBM
(measured: int4-via-XLA decodes 3x SLOWER than int8).  Here the packed bytes
stay packed in HBM and are unpacked in VMEM with the TPU's NATIVE s4 vector
bitcast + hardware s4->bf16 convert — no per-nibble VPU bit arithmetic at
all (an AND/shift/cast unpack chain measured VPU-bound at ~28 tok/s on the
13B; the bandwidth ceiling is ~2x higher).

Packing (must match ``utils/quantize.quantize_kernel_int4``): byte [r, c]
holds W[2r, c] (lo nibble) and W[2r+1, c] (hi nibble), both two's-complement
signed int4; ``pltpu.bitcast(uint8[R, C], int4)`` returns [2R, C] with
exactly that row interleave.  Scales are per (input-group, out-channel):
[in/group, out] fp32.

The (one real) TPU chip can't hold S4 arrays at jit boundaries (the axon
plugin rejects them), so the packed carrier crosses into the kernel as
uint8 and becomes s4 only inside VMEM.

Replaces the role CUDA kernels like AWQ/GPTQ GEMV fill in torch serving
stacks (the reference serves plain fp16 — no equivalent exists there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_chunk(n_in: int, group: int, block_out: int,
                budget: int = 2 * 1024 * 1024) -> int:
    """Largest group-multiple divisor of n_in whose bf16 dequant temp
    [chunk, block_out] stays under ``budget`` bytes (VMEM is ~16M total; the
    packed block + its pipeline double-buffer take most of the rest)."""
    n_groups = n_in // group
    for d in range(n_groups, 0, -1):
        if n_groups % d == 0 and group * d * block_out * 2 <= budget:
            return group * d
    return group


def _kernel(x_ref, p_ref, s_ref, out_ref, *, group: int, block_out: int,
            chunk: int):
    """One program: rows x8 [in] @ one packed out-block -> [rows, BO] fp32.

    W4A8: activations arrive pre-quantized to int8 (per-row scales applied
    by the caller), weights decode s4->s8 with ONE hardware convert, and the
    MXU runs native int8 x int8 -> int32 dots per GROUP; each group's weight
    scale lands on the tiny [rows, BO] dot output as an FMA.  Per packed
    byte the VPU does exactly one convert — no per-element scale multiplies
    (that elementwise path measured VPU-bound), and the packed bytes are
    only ever read packed, so HBM weight traffic is exactly the int4
    stream."""
    x = x_ref[:]                                   # [rows, in] int8
    rows, n_in = x.shape
    gpc = chunk // group                           # groups per chunk
    dims = (((1,), (0,)), ((), ()))

    acc = jnp.zeros((rows, block_out), jnp.float32)
    for c in range(n_in // chunk):
        q4 = pltpu.bitcast(
            p_ref[c * (chunk // 2):(c + 1) * (chunk // 2), :], jnp.int4)
        w8 = q4.astype(jnp.int8)                   # [chunk, BO]
        for g in range(gpc):
            yg = jax.lax.dot_general(
                x[:, c * chunk + g * group:c * chunk + (g + 1) * group],
                w8[g * group:(g + 1) * group, :], dims,
                preferred_element_type=jnp.int32)
            acc += yg.astype(jnp.float32) * s_ref[c * gpc + g, :][None, :]
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("group", "block_out",
                                             "block_rows", "interpret"))
def int4_matmul(x: jnp.ndarray, packed: jnp.ndarray, scale: jnp.ndarray,
                group: int = 128, block_out: int = 512,
                block_rows: int = 256,
                interpret: bool = False) -> jnp.ndarray:
    """x [rows, in] @ dequant(packed [in//2, out], scale [in/g, out]) -> [rows, out].

    W4A8: x is dynamically quantized to int8 per row (absmax/127) and the
    row scale multiplies the fp32 kernel output — so on top of the int4
    weight rounding there is ~0.4%-of-row-amax activation rounding, the
    standard serving trade.  rows is padded to the int8 sublane tile (32).

    Decode (rows <= block_rows) runs a 1D grid over out blocks; prefill-
    sized inputs add a row-block grid dim as the FASTEST-varying axis, so
    the pipeliner keeps each packed block resident across its row sweep
    (packed bytes still stream exactly once when rows <= block_rows^2/...).
    """
    rows, n_in = x.shape
    n_out = scale.shape[-1]
    bo = min(block_out, n_out)
    assert packed.shape == (n_in // 2, n_out), (packed.shape, n_in, n_out)
    assert n_out % bo == 0, (n_out, bo)
    assert n_in % group == 0, (n_in, group)

    # per-row activation quantization (the kernel runs int8 x int8 MXU dots)
    xf = x.astype(jnp.float32)
    xa = jnp.maximum(jnp.max(jnp.abs(xf), -1, keepdims=True), 1e-8) / 127.0
    x8 = jnp.round(xf / xa).astype(jnp.int8)

    if rows <= block_rows:
        br = rows + (-rows) % 32   # one row block, int8-sublane aligned
    else:
        br = block_rows
    pad_rows = (-rows) % br
    if pad_rows:
        x8 = jnp.pad(x8, ((0, pad_rows), (0, 0)))
    rows_p = rows + pad_rows

    chunk = _pick_chunk(n_in, group, bo)
    out = pl.pallas_call(
        functools.partial(_kernel, group=group, block_out=bo, chunk=chunk),
        out_shape=jax.ShapeDtypeStruct((rows_p, n_out), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(n_out // bo, rows_p // br),
            in_specs=[
                pl.BlockSpec((br, n_in), lambda m, r: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_in // 2, bo), lambda m, r: (0, m),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_in // group, bo), lambda m, r: (0, m),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((br, bo), lambda m, r: (r, m),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x8, packed, scale)
    out = out[:rows] if pad_rows else out
    return (out * xa).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("group", "block_out",
                                             "interpret"))
def int4_matmul_stacked(x: jnp.ndarray, packed: jnp.ndarray,
                        scale: jnp.ndarray, layer: jnp.ndarray,
                        group: int = 128, block_out: int = 512,
                        interpret: bool = False) -> jnp.ndarray:
    """Decode matmul against ONE layer of scan-stacked quantized weights,
    sliced INSIDE the kernel's pipeline.

    ``packed`` is [L, in//2, out], ``scale`` [L, in//group, out], ``layer``
    a traced scalar.  A ``lax.scan`` over layers would dynamic-slice the
    layer's packed block to a fresh HBM buffer before every pallas call
    (custom-call operands must be dense) — profiling showed that copy
    costing MORE than the matmuls themselves (~16 us per 13 MB block,
    tripling decode's weight traffic).  Here the layer index arrives as a
    scalar-prefetch argument and the BlockSpec index_map points the
    pipeline's DMAs straight at layer ``layer`` of the stacked array: the
    packed bytes stream HBM->VMEM exactly once, no intermediate copy.

    Decode-only (rows <= 32 after padding); prefill uses the per-layer
    kernel via the XLA-sliced path (one slice per 512-token prefill
    amortises fine)."""
    rows, n_in = x.shape
    n_layers, half_in, n_out = packed.shape
    bo = min(block_out, n_out)
    assert half_in == n_in // 2 and n_out % bo == 0

    xf = x.astype(jnp.float32)
    xa = jnp.maximum(jnp.max(jnp.abs(xf), -1, keepdims=True), 1e-8) / 127.0
    x8 = jnp.round(xf / xa).astype(jnp.int8)
    br = rows + (-rows) % 32
    if br != rows:
        x8 = jnp.pad(x8, ((0, br - rows), (0, 0)))

    def kernel(li_ref, x_ref, p_ref, s_ref, out_ref):
        del li_ref   # consumed by the index_maps only
        _kernel(x_ref, p_ref, s_ref, out_ref, group=group, block_out=bo,
                chunk=chunk)

    chunk = _pick_chunk(n_in, group, bo)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((br, n_out), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_out // bo,),
            in_specs=[
                pl.BlockSpec((br, n_in), lambda m, li: (0, 0)),
                pl.BlockSpec((None, half_in, bo), lambda m, li: (li[0], 0, m)),
                pl.BlockSpec((None, n_in // group, bo),
                             lambda m, li: (li[0], 0, m)),
            ],
            out_specs=pl.BlockSpec((br, bo), lambda m, li: (0, m)),
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x8, packed, scale)
    out = out[:rows] if br != rows else out
    return (out * xa).astype(x.dtype)


def int4_matmul_xla(x: jnp.ndarray, packed: jnp.ndarray, scale: jnp.ndarray,
                    group: int = 128) -> jnp.ndarray:
    """Reference/fallback path (CPU tests, prefill): unpack to bf16 and dot.

    Same packing as the kernel (row-pair, signed nibbles).  On TPU decode
    this materialises the full dequantized matrix — use only where rows are
    large enough to amortise it."""
    half_in, n_out = packed.shape
    n_in = 2 * half_in
    # sign-extended nibble decode (XLA has 8-bit shifts; Mosaic does not)
    lo = ((packed & 0xF).astype(jnp.int8) ^ 8) - 8
    hi = packed.astype(jnp.int8) >> 4
    q = jnp.stack([lo, hi], axis=1).reshape(n_in, n_out)
    w = q.astype(jnp.bfloat16).reshape(n_in // group, group, n_out) \
        * scale[:, None, :].astype(jnp.bfloat16)
    w = w.reshape(n_in, n_out)
    return jnp.dot(x.astype(jnp.bfloat16), w)


# Test hook: route int4_matmul_auto through the Pallas kernel (interpret
# mode off-TPU) instead of the XLA unpack+dot, so CPU parity tests compare
# identical W4A8 numerics between the per-layer and stacked kernels.
FORCE_KERNEL = False


def int4_matmul_auto(x: jnp.ndarray, packed: jnp.ndarray, scale: jnp.ndarray,
                     group: int = 128, block_out: int = 512,
                     max_kernel_rows: int = 2048) -> jnp.ndarray:
    """Dispatch: Pallas kernel on TPU for decode AND prefill-sized row
    counts (the XLA fallback materialises the full dequantized bf16 matrix
    per matmul — ~50 GB of temp traffic per 512-token 13B prefill), XLA
    unpack+dot on CPU (tests) and for very large row counts."""
    lead = x.shape[:-1]
    rows = 1
    for d in lead:
        rows *= d
    x2 = x.reshape(rows, x.shape[-1])
    on_tpu = jax.default_backend() == "tpu"
    if (on_tpu or FORCE_KERNEL) and rows <= max_kernel_rows:
        y = int4_matmul(x2, packed, scale, group=group, block_out=block_out,
                        interpret=not on_tpu)
    else:
        y = int4_matmul_xla(x2, packed, scale, group=group)
    return y.reshape(*lead, y.shape[-1])
