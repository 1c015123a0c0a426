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
