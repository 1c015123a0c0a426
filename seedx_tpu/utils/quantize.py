"""Weight-only int8 quantization utilities (serving path).

``quantize_llama_params`` converts a bf16/fp32 LLaMA param tree into the
layout expected by ``LlamaConfig(quantization="int8")``: every projection
``kernel`` [in, out] becomes ``kernel_q`` int8 + ``kernel_scale`` fp32[out]
(symmetric per-output-channel absmax).  Embeddings, lm_head, norms, and LoRA
factors stay high precision.
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


def quantize_llama_params(params: Any) -> Any:
    """Full-precision llama subtree -> int8 layout (numpy in/out)."""
    flat = traverse_util.flatten_dict(params, sep="/")
    out = {}
    for k, v in flat.items():
        parts = k.split("/")
        if (len(parts) >= 2 and parts[-1] == "kernel"
                and parts[-2] in QUANT_TARGETS):
            q, scale = quantize_kernel(np.asarray(v))
            base = "/".join(parts[:-1])
            out[base + "/kernel_q"] = q
            out[base + "/kernel_scale"] = scale
        else:
            out[k] = v
    return traverse_util.unflatten_dict(out, sep="/")


def dequantize_kernel(q: jnp.ndarray, scale: jnp.ndarray,
                      dtype=jnp.bfloat16) -> jnp.ndarray:
    return q.astype(dtype) * scale.astype(dtype)[None, :]
