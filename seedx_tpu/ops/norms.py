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


def layer_norm_fp32_stats(x: jnp.ndarray, scale: jnp.ndarray,
                          bias: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm with fp32 statistics and input-dtype output.

    Same rationale as ``group_norm_fp32_stats``: ``nn.LayerNorm(dtype=f32)``
    on an upcast input writes fp32 activations to HBM at every norm site in
    the SDXL transformer stack; this keeps the HBM tensors in the compute
    dtype while the mean/var math stays fp32.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = normed * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(dtype)


def group_norm_fp32_stats(x: jnp.ndarray, scale: jnp.ndarray,
                          bias: jnp.ndarray, num_groups: int,
                          eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over NHWC with fp32 statistics and input-dtype output.

    ``nn.GroupNorm(dtype=float32)`` (the numerically safe flax spelling)
    writes the full fp32 activation back to HBM at every norm site — ~25
    ms/step of pure convert+reduce traffic in the SDXL UNet at 1024px.
    This computes mean/var in fp32 but keeps the HBM-visible tensor in the
    input dtype, like ``rms_norm`` above.

    The group statistics are computed WITHOUT the textbook
    ``[..., C] -> [..., G, C/G]`` reshape: that splits the TPU lane dim into
    C/G=10-wide slivers and relayouts the whole activation.  Instead the
    channel axis is sum-reduced in place (lane-aligned) and groups are
    aggregated with a tiny [C, G] segment matmul.
    """
    dtype = x.dtype
    c = x.shape[-1]
    cpg = c // num_groups
    xf = x.astype(jnp.float32)
    red_axes = tuple(range(1, x.ndim - 1))
    s1 = jnp.sum(xf, axis=red_axes)                    # [B, C]
    s2 = jnp.sum(xf * xf, axis=red_axes)               # [B, C]
    seg = jnp.asarray(
        (jnp.arange(c)[:, None] // cpg) == jnp.arange(num_groups)[None, :],
        jnp.float32)                                   # [C, G]
    n = 1
    for a in red_axes:
        n *= x.shape[a]
    n *= cpg
    mean_g = (s1 @ seg) / n                            # [B, G]
    var_g = (s2 @ seg) / n - jnp.square(mean_g)
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = mean_g @ seg.T                            # [B, C]
    inv_c = inv_g @ seg.T
    shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (c,)
    out = (xf - mean_c.reshape(shape)) * inv_c.reshape(shape) \
        * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(dtype)
