"""Independent torch implementation of the SDXL UNet + VAE, used ONLY as a
numerical oracle for the flax models and their diffusers-layout weight
converters (seedx_tpu/models/sdxl/{unet,vae}.py, utils/sdxl_weights.py).

Written from the published SDXL architecture (the diffusers
UNet2DConditionModel / AutoencoderKL layout the reference loads at
src/inference/eval_text2img_seed_x_i.py:59-64 — the package itself is not
installed in this environment).  Parameter names intentionally reproduce the
diffusers state_dict key schema so ``convert_sdxl_unet``/``convert_sdxl_vae``
consume ``state_dict()`` directly; that key-compatibility is exactly what
the tests verify.

Supported subset: what SDXL base/edit use — DownBlock2D +
CrossAttnDownBlock2D, UNetMidBlock2DCrossAttn, mirrored up blocks,
use_linear_projection transformer blocks with GEGLU, text_time added
conditioning; VAE encoder/decoder with single-head mid attention.
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F
from torch import nn


def get_timestep_embedding(t: torch.Tensor, dim: int,
                           flip_sin_to_cos: bool = True,
                           downscale_freq_shift: float = 0.0) -> torch.Tensor:
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = torch.exp(exponent)
    args = t.float()[:, None] * freqs[None]
    emb = torch.cat([torch.sin(args), torch.cos(args)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
    if dim % 2:
        emb = F.pad(emb, (0, 1))
    return emb


class TimestepEmbedding(nn.Module):
    def __init__(self, in_dim, time_embed_dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, time_embed_dim)
        self.linear_2 = nn.Linear(time_embed_dim, time_embed_dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class ResnetBlock2D(nn.Module):
    def __init__(self, in_ch, out_ch, temb_ch=None, groups=32, eps=1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_ch:
            self.time_emb_proj = nn.Linear(temb_ch, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class Attention(nn.Module):
    def __init__(self, query_dim, context_dim, heads, head_dim):
        super().__init__()
        inner = heads * head_dim
        self.heads = heads
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(context_dim or query_dim, inner, bias=False)
        self.to_v = nn.Linear(context_dim or query_dim, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim)])

    def forward(self, x, context=None):
        context = x if context is None else context
        b, n, _ = x.shape
        q, k, v = self.to_q(x), self.to_k(context), self.to_v(context)

        def split(t):
            return t.view(b, -1, self.heads, t.shape[-1] // self.heads
                          ).transpose(1, 2)

        out = F.scaled_dot_product_attention(split(q), split(k), split(v))
        out = out.transpose(1, 2).reshape(b, n, -1)
        return self.to_out[0](out)


class GEGLU(nn.Module):
    def __init__(self, dim, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim, dim_out * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.net = nn.ModuleList([GEGLU(dim, dim * 4), nn.Identity(),
                                  nn.Linear(dim * 4, dim)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, context_dim, heads, head_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, None, heads, head_dim)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, context_dim, heads, head_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        x = x + self.ff(self.norm3(x))
        return x


class Transformer2DModel(nn.Module):
    """use_linear_projection variant (SDXL); GroupNorm eps 1e-6."""

    def __init__(self, ch, depth, context_dim, heads, head_dim, groups=32):
        super().__init__()
        self.norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.proj_in = nn.Linear(ch, ch)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(ch, context_dim, heads, head_dim)
             for _ in range(depth)])
        self.proj_out = nn.Linear(ch, ch)

    def forward(self, x, context):
        b, c, h, w = x.shape
        residual = x
        hidden = self.norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        hidden = self.proj_in(hidden)
        for blk in self.transformer_blocks:
            hidden = blk(hidden, context)
        hidden = self.proj_out(hidden)
        return hidden.reshape(b, h, w, c).permute(0, 3, 1, 2) + residual


class Downsample2D(nn.Module):
    def __init__(self, ch, pad=1):
        super().__init__()
        self.pad = pad
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=pad)

    def forward(self, x):
        if self.pad == 0:        # VAE spelling: asymmetric (0,1,0,1) pad
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class Upsample2D(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class _Block(nn.Module):
    """Container matching diffusers' {resnets, attentions, downsamplers/
    upsamplers} attribute schema."""


class UNet2DConditionModel(nn.Module):
    def __init__(self, in_channels=4, out_channels=4,
                 block_out_channels=(320, 640, 1280), layers_per_block=2,
                 transformer_layers=(0, 2, 10), cross_attention_dim=2048,
                 attention_head_dim=64, addition_time_embed_dim=256,
                 projection_class_embeddings_input_dim=2816, groups=32):
        super().__init__()
        self.addition_time_embed_dim = addition_time_embed_dim
        ch0 = block_out_channels[0]
        ted = ch0 * 4
        self.conv_in = nn.Conv2d(in_channels, ch0, 3, padding=1)
        self.time_embedding = TimestepEmbedding(ch0, ted)
        self.add_embedding = TimestepEmbedding(
            projection_class_embeddings_input_dim, ted)

        def make_attn(ch, depth):
            return Transformer2DModel(ch, depth, cross_attention_dim,
                                      ch // attention_head_dim,
                                      attention_head_dim, groups)

        n = len(block_out_channels)
        self.down_blocks = nn.ModuleList()
        prev = ch0
        for i, ch in enumerate(block_out_channels):
            blk = _Block()
            blk.resnets = nn.ModuleList()
            depth = transformer_layers[i]
            if depth:
                blk.attentions = nn.ModuleList()
            for j in range(layers_per_block):
                blk.resnets.append(ResnetBlock2D(prev if j == 0 else ch, ch,
                                                 ted, groups))
                if depth:
                    blk.attentions.append(make_attn(ch, depth))
            if i < n - 1:
                blk.downsamplers = nn.ModuleList([Downsample2D(ch)])
            self.down_blocks.append(blk)
            prev = ch

        mid_ch = block_out_channels[-1]
        self.mid_block = _Block()
        self.mid_block.resnets = nn.ModuleList(
            [ResnetBlock2D(mid_ch, mid_ch, ted, groups),
             ResnetBlock2D(mid_ch, mid_ch, ted, groups)])
        self.mid_block.attentions = nn.ModuleList(
            [make_attn(mid_ch, transformer_layers[-1])])

        self.up_blocks = nn.ModuleList()
        rev = list(reversed(block_out_channels))
        prev = rev[0]
        for i, ch in enumerate(rev):
            blk = _Block()
            blk.resnets = nn.ModuleList()
            depth = transformer_layers[n - 1 - i]
            if depth:
                blk.attentions = nn.ModuleList()
            skip_in = rev[min(i + 1, n - 1)]
            for j in range(layers_per_block + 1):
                res_skip = skip_in if j == layers_per_block else ch
                res_in = prev if j == 0 else ch
                blk.resnets.append(ResnetBlock2D(res_in + res_skip, ch, ted,
                                                 groups))
                if depth:
                    blk.attentions.append(make_attn(ch, depth))
            if i < n - 1:
                blk.upsamplers = nn.ModuleList([Upsample2D(ch)])
            self.up_blocks.append(blk)
            prev = ch

        self.conv_norm_out = nn.GroupNorm(groups, ch0, eps=1e-5)
        self.conv_out = nn.Conv2d(ch0, out_channels, 3, padding=1)
        self.layers_per_block = layers_per_block

    def forward(self, sample, timestep, encoder_hidden_states, text_embeds,
                time_ids):
        ch0 = self.conv_in.out_channels
        temb = self.time_embedding(
            get_timestep_embedding(timestep.expand(sample.shape[0]), ch0))
        tids = get_timestep_embedding(time_ids.reshape(-1),
                                      self.addition_time_embed_dim)
        tids = tids.reshape(sample.shape[0], -1)
        temb = temb + self.add_embedding(
            torch.cat([text_embeds, tids], dim=-1))

        x = self.conv_in(sample)
        skips = [x]
        for blk in self.down_blocks:
            attns = getattr(blk, "attentions", None)
            for j, res in enumerate(blk.resnets):
                x = res(x, temb)
                if attns is not None:
                    x = attns[j](x, encoder_hidden_states)
                skips.append(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0](x)
                skips.append(x)

        x = self.mid_block.resnets[0](x, temb)
        x = self.mid_block.attentions[0](x, encoder_hidden_states)
        x = self.mid_block.resnets[1](x, temb)

        for blk in self.up_blocks:
            attns = getattr(blk, "attentions", None)
            for j, res in enumerate(blk.resnets):
                x = torch.cat([x, skips.pop()], dim=1)
                x = res(x, temb)
                if attns is not None:
                    x = attns[j](x, encoder_hidden_states)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0](x)

        return self.conv_out(F.silu(self.conv_norm_out(x)))


# ---------------------------------------------------------------------------
# VAE (AutoencoderKL)
# ---------------------------------------------------------------------------

class VAEAttention(nn.Module):
    def __init__(self, ch, groups=32):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        b, c, h, w = x.shape
        hidden = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(hidden), self.to_k(hidden), self.to_v(hidden)
        attn = torch.softmax(q @ k.transpose(1, 2) / math.sqrt(c), dim=-1)
        out = self.to_out[0](attn @ v)
        return x + out.reshape(b, h, w, c).permute(0, 3, 1, 2)


class Encoder(nn.Module):
    def __init__(self, channels=(128, 256, 512, 512), latent_channels=4,
                 layers_per_block=2, groups=32):
        super().__init__()
        n = len(channels)
        self.conv_in = nn.Conv2d(3, channels[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        prev = channels[0]
        for i, ch in enumerate(channels):
            blk = _Block()
            blk.resnets = nn.ModuleList(
                [ResnetBlock2D(prev if j == 0 else ch, ch, None, groups,
                               eps=1e-6) for j in range(layers_per_block)])
            if i < n - 1:
                blk.downsamplers = nn.ModuleList([Downsample2D(ch, pad=0)])
            self.down_blocks.append(blk)
            prev = ch
        ch = channels[-1]
        self.mid_block = _Block()
        self.mid_block.resnets = nn.ModuleList(
            [ResnetBlock2D(ch, ch, None, groups, eps=1e-6),
             ResnetBlock2D(ch, ch, None, groups, eps=1e-6)])
        self.mid_block.attentions = nn.ModuleList([VAEAttention(ch, groups)])
        self.conv_norm_out = nn.GroupNorm(groups, ch, eps=1e-6)
        self.conv_out = nn.Conv2d(ch, 2 * latent_channels, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for blk in self.down_blocks:
            for res in blk.resnets:
                x = res(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0](x)
        x = self.mid_block.resnets[0](x)
        x = self.mid_block.attentions[0](x)
        x = self.mid_block.resnets[1](x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class Decoder(nn.Module):
    def __init__(self, channels=(128, 256, 512, 512), latent_channels=4,
                 layers_per_block=2, groups=32):
        super().__init__()
        n = len(channels)
        rev = list(reversed(channels))
        self.conv_in = nn.Conv2d(latent_channels, rev[0], 3, padding=1)
        ch = rev[0]
        self.mid_block = _Block()
        self.mid_block.resnets = nn.ModuleList(
            [ResnetBlock2D(ch, ch, None, groups, eps=1e-6),
             ResnetBlock2D(ch, ch, None, groups, eps=1e-6)])
        self.mid_block.attentions = nn.ModuleList([VAEAttention(ch, groups)])
        self.up_blocks = nn.ModuleList()
        prev = rev[0]
        for i, ch in enumerate(rev):
            blk = _Block()
            blk.resnets = nn.ModuleList(
                [ResnetBlock2D(prev if j == 0 else ch, ch, None, groups,
                               eps=1e-6) for j in range(layers_per_block + 1)])
            if i < n - 1:
                blk.upsamplers = nn.ModuleList([Upsample2D(ch)])
            self.up_blocks.append(blk)
            prev = ch
        self.conv_norm_out = nn.GroupNorm(groups, rev[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(rev[-1], 3, 3, padding=1)

    def forward(self, z):
        x = self.conv_in(z)
        x = self.mid_block.resnets[0](x)
        x = self.mid_block.attentions[0](x)
        x = self.mid_block.resnets[1](x)
        for blk in self.up_blocks:
            for res in blk.resnets:
                x = res(x)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0](x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class AutoencoderKL(nn.Module):
    def __init__(self, channels=(128, 256, 512, 512), latent_channels=4,
                 layers_per_block=2, groups=32):
        super().__init__()
        self.encoder = Encoder(channels, latent_channels, layers_per_block,
                               groups)
        self.decoder = Decoder(channels, latent_channels, layers_per_block,
                               groups)
        self.quant_conv = nn.Conv2d(2 * latent_channels, 2 * latent_channels, 1)
        self.post_quant_conv = nn.Conv2d(latent_channels, latent_channels, 1)

    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))
