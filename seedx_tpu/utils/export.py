"""Checkpoint export utilities.

The reference exports trained LoRA checkpoints for inference by consolidating
ZeRO shards (zero_to_fp32.py) and later re-applying LoRA weights at load time
(reference: README.md:146-158, src/models/mllm/utils.py:7-16).  Here:

  * ``merge_lora`` folds trained LoRA factors into the base kernels
    (``W' = W + (alpha/r) * A @ B``) so inference runs the plain dense path
    (``lora_rank=0`` config) with zero LoRA overhead — the "llm_seed_x.yaml"
    merged-weights variant,
  * ``export_merged`` merges trainable state back over the frozen tree and
    saves one orbax artifact (sharded = consolidated under orbax).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util


def merge_lora(params: Any, alpha: float = 32.0) -> Any:
    """Fold lora_a/lora_b into sibling kernels; drop the factors.

    Works on both flat [in, out] and scan-stacked [layers, in, out] kernels.
    """
    flat = traverse_util.flatten_dict(params, sep="/")
    out = {}
    for key, value in flat.items():
        if key.endswith("/lora_a") or key.endswith("/lora_b"):
            continue
        if key.endswith("/kernel"):
            base = key[: -len("/kernel")]
            a = flat.get(base + "/lora_a")
            b = flat.get(base + "/lora_b")
            if a is not None and b is not None:
                rank = a.shape[-1]
                scale = alpha / rank
                delta = jnp.einsum("...ir,...ro->...io",
                                   jnp.asarray(a, jnp.float32),
                                   jnp.asarray(b, jnp.float32)) * scale
                value = (jnp.asarray(value, jnp.float32) + delta).astype(
                    np.asarray(value).dtype if isinstance(value, np.ndarray)
                    else value.dtype)
        out[key] = value
    return traverse_util.unflatten_dict(out, sep="/")


def export_merged(state_trainable: Any, frozen: Any, path: str,
                  lora_alpha: float = 32.0) -> Any:
    """Merge trainable-over-frozen, fold LoRA, save one orbax artifact."""
    from seedx_tpu.train.checkpoints import save_pytree
    from seedx_tpu.train.partition import merge_params

    merged = merge_params(state_trainable, frozen)
    merged = merge_lora(merged, alpha=lora_alpha)
    save_pytree(path, merged)
    return merged


def export_serving(params: Any, path: str, family: str,
                   mode: str = None) -> Any:
    """Quantize once, deploy many: save a family's SERVING artifact — the
    already-quantized tree (int8/int4-packed kernels + scales) as one orbax
    checkpoint, so server cold-start skips the multi-GB fp read +
    host-side quantization pass.

    family: "llama" (mode "int8"|"int8_full"|"int4", default int4),
    "vit" (int8), "unet" (int8).  Restore with
    ``train.checkpoints.restore_pytree`` and feed straight to the matching
    quantized model config (``LlamaConfig(quantization=...)``,
    ``qwen_vitg_448(quantization="int8")``,
    ``UNetConfig(quantize="int8")``).  The round trip is bit-exact
    (tests/test_quantize.py) — quantization happens exactly once, at
    export.  No reference counterpart: it serves fp16 from the fp
    checkpoint every launch (reference:
    src/inference/eval_img2text_seed_x_i.py:60-66).

    Returns the quantized tree (numpy leaves)."""
    from seedx_tpu.train.checkpoints import save_pytree
    from seedx_tpu.utils import quantize as qz

    host = jax.tree.map(np.asarray, params)
    if family == "llama":
        qtree = qz.quantize_llama_params(host, mode=mode or "int4")
    elif family == "vit":
        qtree = qz.quantize_vit_params(host)
    elif family == "unet":
        qtree = qz.quantize_unet_params(host)
    else:
        raise ValueError(
            f"unknown family {family!r}; one of ['llama', 'unet', 'vit']")
    save_pytree(path, qtree)
    return qtree
