"""Shared flax building blocks: partitioned Dense, LoRA Dense, torch-layout
multi-head attention for the resamplers, layer norm with logical sharding.

LoRA here replaces the reference's vendored DeepSpeed-patched PEFT fork
(reference: proj/peft/, src/models/mllm/peft_models.py:27-106).  Under SPMD
jit there is no ZeRO-3 gather problem to patch around: LoRA factors are just
extra leaves in the parameter pytree, and "trainable vs frozen" is an optax
mask over path names (see seedx_tpu/train/partition.py).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax.lax
import jax.numpy as jnp
from flax import linen as nn

Initializer = Callable[..., Any]

default_init = nn.initializers.truncated_normal(stddev=0.02)


def _part(init: Initializer, names: Tuple[Optional[str], ...]) -> Initializer:
    return nn.with_logical_partitioning(init, names)


class PDense(nn.Module):
    """Dense with logical partitioning names on the kernel (and bias).

    ``quantize="int8"`` swaps the kernel for int8 codes + per-output fp32
    scales (same layout/param names as LoRADense's int8 path; trees built
    by utils/quantize).  Serving-fit tool: halves weight HBM so the ViT
    trunk can co-reside with the int4 LLM + int8 UNet on one 16G chip."""

    features: int
    kernel_axes: Tuple[Optional[str], Optional[str]]
    use_bias: bool = True
    quantize: str = "none"            # "none" | "int8"
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    kernel_init: Initializer = default_init

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.quantize == "int8":
            kernel_q = self.param(
                "kernel_q",
                _part(nn.initializers.zeros_init(), self.kernel_axes),
                (x.shape[-1], self.features), jnp.int8)
            kernel_scale = self.param(
                "kernel_scale",
                _part(nn.initializers.ones_init(), (self.kernel_axes[1],)),
                (self.features,), jnp.float32)
            kernel = kernel_q.astype(self.dtype) \
                * kernel_scale.astype(self.dtype)[None, :]
        else:
            kernel = self.param(
                "kernel",
                _part(self.kernel_init, self.kernel_axes),
                (x.shape[-1], self.features),
                self.param_dtype,
            ).astype(self.dtype)
        y = jnp.dot(x.astype(self.dtype), kernel)
        if self.use_bias:
            bias = self.param(
                "bias",
                _part(nn.initializers.zeros_init(), (self.kernel_axes[1],)),
                (self.features,),
                self.param_dtype,
            )
            y = y + bias.astype(self.dtype)
        return y


class LoRADense(nn.Module):
    """Dense with an optional low-rank trainable delta and optional int8
    weight-only quantization.

    LoRA matches the reference semantics (r=32, alpha=32, dropout on the LoRA
    input only; configs/clm_models/llm_seed_x_lora.yaml:6-25):
      ``y = x @ W + scale * dropout(x) @ A @ B``, scale = alpha / r.
    ``A`` is init'd gaussian, ``B`` zeros, so the delta starts at 0.

    ``quantize="int8"`` stores the frozen base kernel as int8 + per-output
    fp32 scales; dequant fuses into the matmul.  Decode is HBM-bandwidth
    bound, so int8 weights halve the per-token weight traffic — and they are
    the only way a 13B backbone fits one 16GB v5e chip.  (TPU-native
    replacement for the serving-side fp16 the reference uses,
    eval_img2text_seed_x_i.py:61.)
    """

    features: int
    kernel_axes: Tuple[Optional[str], Optional[str]]
    use_bias: bool = False
    lora_rank: int = 0
    lora_alpha: float = 32.0
    lora_dropout: float = 0.0
    quantize: str = "none"            # "none" | "int8" | "int8_full" | "int4"
    quantize_group: int = 128         # int4 group size along the in dim
    # IA3 (reference vendored fork proj/peft/src/peft/tuners/ia3.py):
    # a learned elementwise rescaling vector, ones-init so the delta
    # starts at identity.  "out" multiplies the layer OUTPUT (the fork's
    # k_proj/v_proj targets: (x@W) * l); "in" multiplies the layer INPUT
    # (the fork's feedforward_modules semantics: down_proj sees the
    # rescaled intermediate activation).  Composes with quantize;
    # typically used with lora_rank=0.
    ia3: Optional[str] = None         # None | "out" | "in"
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    kernel_init: Initializer = default_init

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.ia3 == "in":
            scale_in = self.param(
                "ia3_scale",
                _part(nn.initializers.ones_init(), (self.kernel_axes[0],)),
                (x.shape[-1],), self.param_dtype)
            x = x * scale_in.astype(x.dtype)
        if self.quantize == "int4":
            # Nibble-packed block pairs + group scales (layout documented at
            # utils/quantize.quantize_kernel_int4).  Weight HBM traffic is
            # the decode bound; int4 halves it again over int8.  Decode-sized
            # row counts go through the Pallas kernel (packed bytes stay
            # packed in HBM); prefill/CPU takes the XLA unpack+dot.
            from seedx_tpu.ops.int4_matmul import int4_matmul_auto

            n_in = x.shape[-1]
            group = self.quantize_group if n_in % self.quantize_group == 0 \
                else n_in
            kernel_q = self.param(
                "kernel_q4",
                _part(nn.initializers.zeros_init(), self.kernel_axes),
                (n_in // 2, self.features), jnp.uint8)
            kernel_scale = self.param(
                "kernel_scale",
                _part(nn.initializers.ones_init(), (None, self.kernel_axes[1])),
                (n_in // group, self.features), jnp.float32)
            y = int4_matmul_auto(x.astype(self.dtype), kernel_q, kernel_scale,
                                 group=group)
            return self._finish(x, y)
        if self.quantize.startswith("int8"):
            kernel_q = self.param(
                "kernel_q",
                _part(nn.initializers.zeros_init(), self.kernel_axes),
                (x.shape[-1], self.features), jnp.int8)
            kernel_scale = self.param(
                "kernel_scale",
                _part(nn.initializers.ones_init(), (self.kernel_axes[1],)),
                (self.features,), jnp.float32)
            kernel = kernel_q.astype(self.dtype) \
                * kernel_scale.astype(self.dtype)[None, :]
            y = jnp.dot(x.astype(self.dtype), kernel)
            return self._finish(x, y)
        kernel = self.param(
            "kernel",
            _part(self.kernel_init, self.kernel_axes),
            (x.shape[-1], self.features),
            self.param_dtype,
        )
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        return self._finish(x, y)

    def _finish(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """LoRA delta + bias (runs inside the compact scope)."""
        if self.lora_rank > 0:
            lora_a = self.param(
                "lora_a",
                _part(nn.initializers.he_uniform(), (self.kernel_axes[0], None)),
                (x.shape[-1], self.lora_rank),
                self.param_dtype,
            )
            lora_b = self.param(
                "lora_b",
                _part(nn.initializers.zeros_init(), (None, self.kernel_axes[1])),
                (self.lora_rank, self.features),
                self.param_dtype,
            )
            scale = self.lora_alpha / self.lora_rank
            xd = x
            # Dropout is rng-driven: training passes a "dropout" rng, inference
            # doesn't — no deterministic flag threads through the call tree.
            if self.lora_dropout > 0.0 and self.has_rng("dropout"):
                rate = self.lora_dropout
                keep = jax.random.bernoulli(
                    self.make_rng("dropout"), 1.0 - rate, xd.shape)
                xd = jnp.where(keep, xd / (1.0 - rate), 0.0).astype(xd.dtype)
            delta = jnp.dot(
                jnp.dot(xd.astype(self.dtype), lora_a.astype(self.dtype)),
                lora_b.astype(self.dtype),
            )
            y = y + scale * delta
        if self.ia3 == "out":
            ia3_scale = self.param(
                "ia3_scale",
                _part(nn.initializers.ones_init(), (self.kernel_axes[1],)),
                (self.features,), self.param_dtype)
            y = y * ia3_scale.astype(y.dtype)
        if self.use_bias:
            bias = self.param(
                "bias",
                _part(nn.initializers.zeros_init(), (self.kernel_axes[1],)),
                (self.features,),
                self.param_dtype,
            )
            y = y + bias.astype(self.dtype)
        return y


class PLayerNorm(nn.Module):
    """LayerNorm (fp32 statistics) with partitioned scale/bias."""

    epsilon: float = 1e-6
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        scale = self.param(
            "scale", _part(nn.initializers.ones_init(), (self.axis_name,)),
            (dim,), self.param_dtype)
        bias = self.param(
            "bias", _part(nn.initializers.zeros_init(), (self.axis_name,)),
            (dim,), self.param_dtype)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        normed = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return normed.astype(self.dtype) * scale.astype(self.dtype) + bias.astype(self.dtype)


class RMSNorm(nn.Module):
    """LLaMA RMSNorm (reference: modeling_llama_xformer.py:75-94)."""

    epsilon: float = 1e-5
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        scale = self.param(
            "scale", _part(nn.initializers.ones_init(), (self.axis_name,)),
            (dim,), self.param_dtype)
        from seedx_tpu.ops.norms import rms_norm

        return rms_norm(x.astype(self.dtype), scale.astype(self.dtype), self.epsilon)


class TorchMHA(nn.Module):
    """torch ``nn.MultiheadAttention``-equivalent cross attention.

    Used by the qwen-style Resampler (reference: qwen_visual.py:121,145).
    Separate q/k/v kernels with biases + out projection; fp32 softmax.
    """

    num_heads: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
        # q: [batch, nq, dim]; k/v: [batch, nkv, dim]
        dim = q.shape[-1]
        head_dim = dim // self.num_heads

        def proj(name, x):
            return PDense(dim, kernel_axes=("embed", "heads"), dtype=self.dtype,
                          param_dtype=self.param_dtype, name=name)(x)

        qp = proj("q_proj", q).reshape(*q.shape[:-1], self.num_heads, head_dim)
        kp = proj("k_proj", k).reshape(*k.shape[:-1], self.num_heads, head_dim)
        vp = proj("v_proj", v).reshape(*v.shape[:-1], self.num_heads, head_dim)

        from seedx_tpu.ops.attention import dot_product_attention

        out = dot_product_attention(qp, kp, vp, impl="xla")
        out = out.reshape(*q.shape[:-1], dim)
        return PDense(dim, kernel_axes=("heads", "embed"), dtype=self.dtype,
                      param_dtype=self.param_dtype, name="out_proj")(out)


class MLP(nn.Module):
    """ViT-style MLP: c_fc -> GELU -> c_proj (reference: qwen_visual.py:253-255)."""

    hidden: int
    quantize: str = "none"
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        h = PDense(self.hidden, kernel_axes=("embed", "mlp"), dtype=self.dtype,
                   quantize=self.quantize,
                   param_dtype=self.param_dtype, name="c_fc")(x)
        h = nn.gelu(h, approximate=False)
        return PDense(dim, kernel_axes=("mlp", "embed"), dtype=self.dtype,
                      quantize=self.quantize,
                      param_dtype=self.param_dtype, name="c_proj")(h)
