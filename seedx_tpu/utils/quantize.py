"""Weight-only int8 quantization utilities (serving path).

``quantize_llama_params`` converts a bf16/fp32 LLaMA param tree into the
layout expected by ``LlamaConfig(quantization="int8")``: every projection
``kernel`` [in, out] becomes ``kernel_q`` int8 + ``kernel_scale`` fp32[out]
(symmetric per-output-channel absmax).  Embeddings, lm_head, norms, and LoRA
factors stay high precision.

No reference counterpart: the reference serves fp16 and has no
quantization anywhere (reference: src/inference/eval_img2text_seed_x_i.py:61
— ``.half()`` is the whole story); this ladder is what fits the 13B on a
16G v5e chip and unlocks batched serving (PARITY.md row 28).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

QUANT_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj",
                 "gate_proj", "up_proj", "down_proj")


def quantize_kernel(kernel: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """[in, out] or scan-stacked [layers, in, out] ->
    (int8 same shape, per-output scale fp32 [out] / [layers, out])."""
    kernel = np.asarray(kernel, np.float32)
    reduce_axis = kernel.ndim - 2       # the "in" dim
    absmax = np.maximum(np.abs(kernel).max(axis=reduce_axis), 1e-8)
    scale = (absmax / 127.0).astype(np.float32)
    q = np.clip(np.round(kernel / np.expand_dims(scale, reduce_axis)),
                -127, 127).astype(np.int8)
    return q, scale


def quantize_kernel_int4(kernel: np.ndarray, group: int = 128
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """[in, out] or scan-stacked [layers, in, out] ->
    (packed uint8 [..., in//2, out], group scales fp32 [..., in//group, out]).

    Row-pair packing (must match ops/int4_matmul.py): byte [r, c] carries
    W[2r, c] in its lo nibble and W[2r+1, c] in its hi nibble, both as
    two's-complement signed int4.  This is exactly the layout the TPU's
    native s4 vector bitcast expects — ``pltpu.bitcast(uint8[R, C], int4)``
    yields [2R, C] with rows interleaved (2r <- lo, 2r+1 <- hi), so the
    kernel unpacks with ONE hardware cast instead of per-nibble VPU bit ops.
    Symmetric absmax per (input-group, out-channel): scale = absmax/7,
    codes in [-7, 7]."""
    kernel = np.asarray(kernel, np.float32)
    *lead, n_in, n_out = kernel.shape
    assert n_in % 2 == 0, "in dim must be even to nibble-pack"
    if n_in % group:
        group = n_in
    g = kernel.reshape(*lead, n_in // group, group, n_out)
    absmax = np.maximum(np.abs(g).max(axis=-2), 1e-8)
    scale = (absmax / 7.0).astype(np.float32)       # [..., in//g, out]
    q = np.clip(np.round(g / scale[..., None, :]), -7, 7).astype(np.int8)
    q = q.reshape(*lead, n_in, n_out)
    lo = q[..., 0::2, :] & 0xF
    hi = q[..., 1::2, :] & 0xF
    packed = (lo | (hi << 4)).astype(np.uint8)      # [..., in//2, out]
    return packed, scale


def quantize_embedding(table: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """[vocab, hidden] -> (int8 table, per-ROW fp32 scale [vocab]) —
    per-token scaling (each gathered row dequantizes with its own scale)."""
    table = np.asarray(table, np.float32)
    absmax = np.maximum(np.abs(table).max(axis=-1), 1e-8)
    scale = (absmax / 127.0).astype(np.float32)
    q = np.clip(np.round(table / scale[:, None]), -127, 127).astype(np.int8)
    return q, scale


def quantize_llama_params(params: Any, full: bool = False,
                          mode: str = None) -> Any:
    """Full-precision llama subtree -> quantized layout (numpy in/out).

    mode:
      * "int8"      — projections int8 (default; ``full=False``),
      * "int8_full" — + embedding (per-row) and lm_head (``full=True``),
      * "int4"      — projections nibble-packed int4 with group scales;
        embedding + lm_head int8 (matches LlamaConfig(quantization="int4")).
    """
    mode = mode or ("int8_full" if full else "int8")
    full = mode in ("int8_full", "int4")
    flat = traverse_util.flatten_dict(params, sep="/")
    out = {}
    for k, v in flat.items():
        parts = k.split("/")
        base = "/".join(parts[:-1])
        if (len(parts) >= 2 and parts[-1] == "kernel"
                and parts[-2] in QUANT_TARGETS):
            if mode == "int4":
                q, scale = quantize_kernel_int4(np.asarray(v))
                out[base + "/kernel_q4"] = q
            else:
                q, scale = quantize_kernel(np.asarray(v))
                out[base + "/kernel_q"] = q
            out[base + "/kernel_scale"] = scale
        elif full and len(parts) >= 2 and parts[-1] == "kernel" \
                and parts[-2] == "lm_head":
            q, scale = quantize_kernel(np.asarray(v))
            out[base + "/kernel_q"] = q
            out[base + "/kernel_scale"] = scale
        elif full and parts[-1] == "embedding":
            q, scale = quantize_embedding(np.asarray(v))
            out[base + "/embedding_q"] = q
            out[base + "/embedding_scale"] = scale
        else:
            out[k] = v
    return traverse_util.unflatten_dict(out, sep="/")


def dequantize_kernel(q: jnp.ndarray, scale: jnp.ndarray,
                      dtype=jnp.bfloat16) -> jnp.ndarray:
    return q.astype(dtype) * scale.astype(dtype)[None, :]


VIT_QUANT_TARGETS = ("in_proj", "out_proj", "c_fc", "c_proj")


def quantize_vit_params(params: Any) -> Any:
    """Full-precision ViT tree -> the layout ``ViTConfig(quantization="int8")``
    expects: every trunk-block projection ``kernel`` (scan-stacked
    [layers, in, out]) becomes ``kernel_q`` int8 + ``kernel_scale`` fp32
    per output channel.  Biases, layernorms, pos embeds, the patchify conv
    and the attn-pool resampler stay high precision (~3% of weights).

    Memory-fit serving tool (3.8 -> 1.9 GB for ViT-bigG); no reference
    counterpart (it serves fp16, src/inference/eval_img2text_seed_x_i.py:58)."""
    flat = traverse_util.flatten_dict(params, sep="/")
    out = {}
    for k, v in flat.items():
        parts = k.split("/")
        base = "/".join(parts[:-1])
        if (parts[0] == "blocks" and parts[-1] == "kernel"
                and parts[-2] in VIT_QUANT_TARGETS):
            q, scale = quantize_kernel(np.asarray(v))
            out[base + "/kernel_q"] = q
            out[base + "/kernel_scale"] = scale
        else:
            out[k] = v
    return traverse_util.unflatten_dict(out, sep="/")


# kept high precision in the int8 UNet: tiny and numerically sensitive
UNET_SKIP_PREFIXES = ("time_embed_1", "time_embed_2", "add_embed_1",
                      "add_embed_2", "conv_in", "conv_out")


def quantize_unet_params(params: Any) -> Any:
    """Full-precision SDXL UNet tree -> the layout expected by
    ``UNetConfig(quantize="int8")``: every block Dense/Conv ``kernel``
    ([in, out] or [kh, kw, in, out]) becomes ``kernel_q`` int8 +
    ``kernel_scale`` fp32[out] (symmetric per-output-channel absmax);
    biases and norm scales stay fp32; the time/added-cond embeds and
    conv_in/conv_out stay unquantized (UNET_SKIP_PREFIXES).

    Halves the 2.6B UNet's HBM footprint (5.2 -> 2.6 GB bf16-equivalent);
    no reference counterpart (it serves the UNet fp16,
    eval_text2img_seed_x_i.py:59-64)."""
    flat = traverse_util.flatten_dict(params, sep="/")
    out = {}
    for k, v in flat.items():
        parts = k.split("/")
        base = "/".join(parts[:-1])
        if parts[-1] == "kernel" and parts[0] not in UNET_SKIP_PREFIXES:
            w = np.asarray(v, np.float32)
            lead = w.shape[:-1]
            q, scale = quantize_kernel(w.reshape(-1, w.shape[-1]))
            out[base + "/kernel_q"] = q.reshape(*lead, w.shape[-1])
            out[base + "/kernel_scale"] = scale
        else:
            out[k] = v
    return traverse_util.unflatten_dict(out, sep="/")
