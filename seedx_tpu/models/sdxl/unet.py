"""SDXL UNet2DCondition, TPU-native flax implementation.

Capability parity with the diffusers UNet the reference drives
(reference: src/inference/eval_text2img_seed_x_i.py:64 —
``UNet2DConditionModel.from_pretrained('stable-diffusion-xl-base-1.0')``;
adapter fine-tunes cross-attn to_k/to_v or full FT,
src/models/detokenizer/adapter_modules.py:21-33; the Edit variant widens
``conv_in`` 4 -> 8 channels with zero-init new channels,
adapter_modules.py:183-209).

SDXL base geometry:
  * block channels (320, 640, 1280); down = [Down, CrossAttnDown, CrossAttnDown]
    with 2 resnets each; transformer depths (0, 2, 10); heads = C/64,
  * mid = CrossAttn depth 10; up mirrored with 3 resnets per block,
  * conditioning: 2048-d encoder states (the de-tokenizer's dual text
    stream), 1280-d pooled ``text_embeds`` + 6 ``time_ids`` -> "text_time"
    added embedding (256-d sincos each -> 2816 -> 1280).

TPU-first: NHWC layout throughout, bf16 compute with fp32 GroupNorm, heads
fused into one qkv matmul for self-attention; the whole forward jits into a
single program (no python per-block dispatch at runtime).

SPMD: activations carry ``("cfg_batch", "height", None, None)`` logical
constraints at every resolution change, so under an active mesh +
``nn.logical_axis_rules`` (see ``SDXLAdapter.shard``) the CFG branches shard
over the ``data`` axis and the latent rows over ``tensor`` — GSPMD inserts
the conv halo exchanges and re-gathers around self-attention.  With no rules
in scope the constraints are no-ops, so the single-chip path is unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from seedx_tpu.ops.attention import dot_product_attention


def _spatial_constraint(x: jnp.ndarray) -> jnp.ndarray:
    """Logical sharding hint on NHWC activations (no-op without rules)."""
    return nn.with_logical_constraint(x, ("cfg_batch", "height", None, None))


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4               # 8 for the Edit variant
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280)
    layers_per_block: int = 2
    transformer_layers: Tuple[int, ...] = (0, 2, 10)  # 0 = plain DownBlock
    cross_attention_dim: int = 2048
    attention_head_dim: int = 64
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 2816
    norm_num_groups: int = 32
    # "int8": every block Dense/Conv kernel is stored int8 with per-output
    # fp32 scales (utils/quantize.quantize_unet_params builds the tree) —
    # halves the 2.6B UNet's HBM footprint (5.2 -> 2.6 GB) so the denoise
    # can co-reside with the VAE/LLM on one 16G chip.  Time/added-cond
    # embeds and conv_in/conv_out stay high precision (tiny, sensitive).
    quantize: str = "none"
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


def sdxl_base_unet(**overrides) -> UNetConfig:
    return UNetConfig(**overrides)


def sdxl_edit_unet(**overrides) -> UNetConfig:
    """8-channel conv_in variant for SEED-X-Edit
    (reference: adapter_modules.py:183-198)."""
    overrides.setdefault("in_channels", 8)
    return UNetConfig(**overrides)


def sdxl_debug_unet(**overrides) -> UNetConfig:
    kw = dict(block_out_channels=(32, 64), transformer_layers=(0, 1),
              cross_attention_dim=64, attention_head_dim=32,
              norm_num_groups=8, addition_time_embed_dim=32,
              projection_class_embeddings_input_dim=32 * 6 + 64)
    kw.update(overrides)
    return UNetConfig(**kw)


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       max_period: float = 10000.0,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0) -> jnp.ndarray:
    """Sinusoidal embedding (diffusers get_timestep_embedding semantics)."""
    half = dim // 2
    exponent = -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[..., None] * freqs
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos],
                          axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb


class GroupNorm(nn.Module):
    """GroupNorm with fp32 statistics but input-dtype output (the flax
    ``nn.GroupNorm(dtype=float32)`` spelling writes fp32 activations to HBM
    at every norm — measured ~25 ms/step of convert+reduce traffic in the
    1024px denoise).  Param names/shapes match ``nn.GroupNorm`` so
    torch->flax key mapping is unchanged."""

    num_groups: int
    epsilon: float = 1e-5
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from seedx_tpu.ops.norms import group_norm_fp32_stats

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (c,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,),
                          self.param_dtype)
        return group_norm_fp32_stats(x, scale, bias, self.num_groups,
                                     self.epsilon)


def group_norm(cfg: "UNetConfig", name: str):
    """fp32-statistics GroupNorm; params live directly at ``name`` (flat
    scope so torch->flax key mapping is 1:1)."""
    return GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-5,
                     param_dtype=cfg.param_dtype, name=name)


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics but input-dtype HBM tensors (the
    ``nn.LayerNorm(dtype=float32)`` spelling upcasts the whole activation).
    Param names match ``nn.LayerNorm`` for 1:1 torch key mapping."""

    param_dtype: Any = jnp.float32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        from seedx_tpu.ops.norms import layer_norm_fp32_stats

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (c,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,),
                          self.param_dtype)
        return layer_norm_fp32_stats(x, scale, bias, self.epsilon)


class Dense8(nn.Module):
    """int8 weight-only Dense: kernel_q int8 + per-output fp32 scale.

    The scale lands on the (small) OUTPUT, not the weight: for per-output-
    channel s, ``x @ (w*s) == (x @ w) * s`` exactly, and the weight read is
    then a pure int8->bf16 cast XLA fuses into the matmul's operand stream.
    The multiply-on-weights form materialised a bf16 weight tensor per eval
    (+25% denoise time measured at 1024²)."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kq = self.param("kernel_q", nn.initializers.zeros_init(),
                        (x.shape[-1], self.features), jnp.int8)
        ks = self.param("kernel_scale", nn.initializers.ones_init(),
                        (self.features,), jnp.float32)
        y = jnp.dot(x.astype(self.dtype), kq.astype(self.dtype))
        y = y * ks.astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(),
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class Conv8(nn.Module):
    """int8 weight-only 2D conv (NHWC): kernel_q int8 [kh, kw, in, out] +
    per-output fp32 scale.  Scale applied to the conv OUTPUT (exact for
    per-output-channel scales; see Dense8) so the kernel read stays a
    fusible int8->bf16 cast — no bf16 weight materialisation per eval."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kq = self.param("kernel_q", nn.initializers.zeros_init(),
                        (kh, kw, x.shape[-1], self.features), jnp.int8)
        ks = self.param("kernel_scale", nn.initializers.ones_init(),
                        (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        pad = [(self.padding, self.padding)] * 2
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kq.astype(self.dtype),
            window_strides=self.strides,
            padding=pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y * ks.astype(self.dtype) + bias.astype(self.dtype)


def _dense(cfg: "UNetConfig", features: int, name: str,
           use_bias: bool = True):
    if cfg.quantize == "int8":
        return Dense8(features, use_bias=use_bias, dtype=cfg.dtype, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, name=name)


def _conv(cfg: "UNetConfig", features: int, kernel_size, name: str,
          strides=(1, 1), padding: int = 1):
    if cfg.quantize == "int8":
        return Conv8(features, kernel_size, strides=strides, padding=padding,
                     dtype=cfg.dtype, name=name)
    return nn.Conv(features, kernel_size, strides=strides, padding=padding,
                   dtype=cfg.dtype, param_dtype=cfg.param_dtype, name=name)


class ResnetBlock(nn.Module):
    out_channels: int
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, temb):
        cfg = self.cfg
        h = group_norm(cfg, "norm1")(x)
        h = nn.silu(h)
        h = _conv(cfg, self.out_channels, (3, 3), "conv1")(h)
        t = _dense(cfg, self.out_channels, "time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = group_norm(cfg, "norm2")(h)
        h = nn.silu(h)
        h = _conv(cfg, self.out_channels, (3, 3), "conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = _conv(cfg, self.out_channels, (1, 1), "conv_shortcut",
                      padding=0)(x)
        return x + h


class CrossAttention(nn.Module):
    query_dim: int
    context_dim: Optional[int]
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, context=None):
        cfg = self.cfg
        context = x if context is None else context
        heads = self.query_dim // cfg.attention_head_dim
        inner = self.query_dim

        q = _dense(cfg, inner, "to_q", use_bias=False)(x)
        k = _dense(cfg, inner, "to_k", use_bias=False)(context)
        v = _dense(cfg, inner, "to_v", use_bias=False)(context)

        def split(t):
            return t.reshape(*t.shape[:-1], heads, cfg.attention_head_dim)

        # auto: self-attention (seq 4096/1024 at 1024px, no mask) takes the
        # Pallas flash path — the XLA path writes the fp32 [B, H, S, S]
        # probs to HBM, ~10 GB/step of pure traffic at 1024px; cross-attn
        # (kv = 64 image-feature tokens, not 128-aligned) stays on XLA.
        out = dot_product_attention(split(q), split(k), split(v), impl="auto")
        out = out.reshape(*x.shape[:-1], inner)
        return _dense(cfg, self.query_dim, "to_out")(out)


class GEGLU(nn.Module):
    dim_out: int
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x):
        h = _dense(self.cfg, self.dim_out * 2, "proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate, approximate=False)


class BasicTransformerBlock(nn.Module):
    dim: int
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, context):
        cfg = self.cfg
        ln = lambda name: LayerNorm(param_dtype=cfg.param_dtype, name=name)
        h = ln("norm1")(x)
        x = x + CrossAttention(self.dim, None, cfg, name="attn1")(h)
        h = ln("norm2")(x)
        x = x + CrossAttention(self.dim, cfg.cross_attention_dim, cfg,
                               name="attn2")(h, context)
        h = ln("norm3")(x)
        h = GEGLU(self.dim * 4, cfg, name="ff_geglu")(h)
        x = x + _dense(cfg, self.dim, "ff_out")(h)
        return x


class Transformer2D(nn.Module):
    channels: int
    depth: int
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, context):
        cfg = self.cfg
        b, h, w, c = x.shape
        residual = x
        # diffusers Transformer2DModel's GroupNorm uses eps 1e-6 (unlike the
        # resnets' 1e-5) — verified by the torch oracle test
        hidden = GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                           param_dtype=cfg.param_dtype, name="norm")(x)
        hidden = hidden.reshape(b, h * w, c)
        hidden = _dense(cfg, self.channels, "proj_in")(hidden)
        for i in range(self.depth):
            hidden = BasicTransformerBlock(self.channels, cfg,
                                           name=f"block_{i}")(hidden, context)
        hidden = _dense(cfg, self.channels, "proj_out")(hidden)
        return hidden.reshape(b, h, w, c) + residual


class Downsample(nn.Module):
    channels: int
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x):
        return _conv(self.cfg, self.channels, (3, 3), "conv",
                     strides=(2, 2))(x)


class Upsample(nn.Module):
    channels: int
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return _conv(self.cfg, self.channels, (3, 3), "conv")(x)


class UNet2DCondition(nn.Module):
    cfg: UNetConfig

    @nn.compact
    def __call__(self, sample: jnp.ndarray, timesteps: jnp.ndarray,
                 encoder_hidden_states: jnp.ndarray,
                 text_embeds: jnp.ndarray,
                 time_ids: jnp.ndarray) -> jnp.ndarray:
        """Args (NHWC):
          sample: [B, H, W, in_channels] noisy latents (+ condition latents
            channel-concat for the Edit variant),
          timesteps: [B] or scalar,
          encoder_hidden_states: [B, T, cross_attention_dim],
          text_embeds: [B, 1280] pooled conditioning,
          time_ids: [B, 6] (orig_size + crop + target_size).
        Returns eps prediction [B, H, W, out_channels].
        """
        cfg = self.cfg
        ch0 = cfg.block_out_channels[0]
        ted = cfg.time_embed_dim

        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        # --- time + added-condition embeddings ("text_time") ---
        temb = timestep_embedding(timesteps, ch0)
        temb = nn.Dense(ted, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                        name="time_embed_1")(temb.astype(cfg.dtype))
        temb = nn.Dense(ted, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                        name="time_embed_2")(nn.silu(temb))

        tids = timestep_embedding(time_ids.reshape(-1),
                                  cfg.addition_time_embed_dim)
        tids = tids.reshape(sample.shape[0], -1)
        add = jnp.concatenate([text_embeds.astype(jnp.float32), tids], axis=-1)
        add = nn.Dense(ted, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                       name="add_embed_1")(add.astype(cfg.dtype))
        add = nn.Dense(ted, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                       name="add_embed_2")(nn.silu(add))
        temb = temb + add

        context = encoder_hidden_states.astype(cfg.dtype)
        x = nn.Conv(ch0, (3, 3), padding=1, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype,
                    name="conv_in")(sample.astype(cfg.dtype))
        x = _spatial_constraint(x)

        # --- down ---
        skips = [x]
        n_blocks = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            depth = cfg.transformer_layers[i]
            for j in range(cfg.layers_per_block):
                x = ResnetBlock(ch, cfg, name=f"down_{i}_res_{j}")(x, temb)
                if depth:
                    x = Transformer2D(ch, depth, cfg,
                                      name=f"down_{i}_attn_{j}")(x, context)
                skips.append(x)
            if i < n_blocks - 1:
                x = _spatial_constraint(
                    Downsample(ch, cfg, name=f"down_{i}_downsample")(x))
                skips.append(x)

        # --- mid ---
        ch = cfg.block_out_channels[-1]
        mid_depth = cfg.transformer_layers[-1]
        x = ResnetBlock(ch, cfg, name="mid_res_0")(x, temb)
        if mid_depth:
            x = Transformer2D(ch, mid_depth, cfg, name="mid_attn")(x, context)
        x = ResnetBlock(ch, cfg, name="mid_res_1")(x, temb)
        x = _spatial_constraint(x)

        # --- up (reversed channels, layers_per_block+1 resnets) ---
        for i, ch in enumerate(reversed(cfg.block_out_channels)):
            level = n_blocks - 1 - i
            depth = cfg.transformer_layers[level]
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = ResnetBlock(ch, cfg, name=f"up_{i}_res_{j}")(x, temb)
                if depth:
                    x = Transformer2D(ch, depth, cfg,
                                      name=f"up_{i}_attn_{j}")(x, context)
            if i < n_blocks - 1:
                x = _spatial_constraint(
                    Upsample(ch, cfg, name=f"up_{i}_upsample")(x))

        x = group_norm(cfg, "conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=cfg.dtype,
                       param_dtype=cfg.param_dtype, name="conv_out")(x)
