"""Normalization primitives.

RMSNorm matches the reference LLaMA backbone's ``LlamaRMSNorm``
(reference: src/models/mllm/modeling_llama_xformer.py:75-94): variance in
fp32, scale applied in the input dtype.  Plain functions — XLA fuses these
into neighbouring matmuls, so no Pallas kernel is needed here.
"""

from __future__ import annotations

import jax.lax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return weight * normed.astype(dtype)
