"""Diffusers SDXL checkpoint -> JAX param-tree converters.

Covers the frozen SDXL base the reference loads
(reference: src/inference/eval_text2img_seed_x_i.py:60-64 — UNet, VAE,
scheduler from stabilityai/stable-diffusion-xl-base-1.0) plus the released
detokenizer UNet deltas (full fine-tune or to_k/to_v only,
adapter_modules.py:21-33) and the Edit variant's widened 8-channel
``conv_in`` (zero-init new channels, adapter_modules.py:183-198).

torch Conv2d [out, in, kh, kw] -> flax [kh, kw, in, out]; Linear transposed;
GroupNorm/LayerNorm weight -> scale.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np

from seedx_tpu.utils.weights import _ln, _linear, _np


def _conv(sd, key):
    return {"kernel": _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd[f"{key}.bias"])}


def _gn(sd, key):
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def _lin(sd, key):
    out = {"kernel": _linear(sd, f"{key}.weight")}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _resnet(sd, p):
    out = {
        "norm1": _gn(sd, f"{p}.norm1"),
        "conv1": _conv(sd, f"{p}.conv1"),
        "norm2": _gn(sd, f"{p}.norm2"),
        "conv2": _conv(sd, f"{p}.conv2"),
    }
    if f"{p}.time_emb_proj.weight" in sd:
        out["time_emb_proj"] = _lin(sd, f"{p}.time_emb_proj")
    if f"{p}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{p}.conv_shortcut")
    return out


def _basic_transformer(sd, p):
    def attn(q):
        out = {
            "to_q": _lin(sd, f"{q}.to_q"),
            "to_k": _lin(sd, f"{q}.to_k"),
            "to_v": _lin(sd, f"{q}.to_v"),
            "to_out": _lin(sd, f"{q}.to_out.0"),
        }
        return out

    return {
        "norm1": _ln(sd, f"{p}.norm1"),
        "attn1": attn(f"{p}.attn1"),
        "norm2": _ln(sd, f"{p}.norm2"),
        "attn2": attn(f"{p}.attn2"),
        "norm3": _ln(sd, f"{p}.norm3"),
        "ff_geglu": {"proj": _lin(sd, f"{p}.ff.net.0.proj")},
        "ff_out": _lin(sd, f"{p}.ff.net.2"),
    }


def _transformer2d(sd, p, depth):
    out = {
        "norm": _gn(sd, f"{p}.norm"),
        "proj_in": _lin(sd, f"{p}.proj_in"),
        "proj_out": _lin(sd, f"{p}.proj_out"),
    }
    for k in range(depth):
        out[f"block_{k}"] = _basic_transformer(
            sd, f"{p}.transformer_blocks.{k}")
    return out


def widen_conv_in(kernel: np.ndarray, to_channels: int) -> np.ndarray:
    """Widen a [kh, kw, in, out] conv kernel's input channels, zero-init new
    channels (Edit variant surgery, reference: adapter_modules.py:191-198)."""
    have = kernel.shape[2]
    if to_channels <= have:
        return kernel
    pad = np.zeros((*kernel.shape[:2], to_channels - have, kernel.shape[3]),
                   kernel.dtype)
    return np.concatenate([kernel, pad], axis=2)


def convert_sdxl_unet(
    sd: Mapping[str, Any],
    block_out_channels=(320, 640, 1280),
    layers_per_block: int = 2,
    transformer_layers=(0, 2, 10),
    widen_conv_in_to: Optional[int] = None,
) -> Dict:
    """Diffusers UNet2DConditionModel state dict -> UNet2DCondition params.

    ``widen_conv_in_to=8`` reproduces the Edit variant's conv_in surgery
    (zero-init channels 4..8, reference adapter_modules.py:191-198) for a
    base (4-channel) checkpoint."""
    n = len(block_out_channels)
    out: Dict[str, Any] = {
        "conv_in": _conv(sd, "conv_in"),
        "time_embed_1": _lin(sd, "time_embedding.linear_1"),
        "time_embed_2": _lin(sd, "time_embedding.linear_2"),
        "add_embed_1": _lin(sd, "add_embedding.linear_1"),
        "add_embed_2": _lin(sd, "add_embedding.linear_2"),
        "conv_norm_out": _gn(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }
    if widen_conv_in_to:
        out["conv_in"]["kernel"] = widen_conv_in(out["conv_in"]["kernel"],
                                                 widen_conv_in_to)

    for i in range(n):
        depth = transformer_layers[i]
        for j in range(layers_per_block):
            out[f"down_{i}_res_{j}"] = _resnet(
                sd, f"down_blocks.{i}.resnets.{j}")
            if depth:
                out[f"down_{i}_attn_{j}"] = _transformer2d(
                    sd, f"down_blocks.{i}.attentions.{j}", depth)
        if i < n - 1:
            out[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"down_blocks.{i}.downsamplers.0.conv")}

    out["mid_res_0"] = _resnet(sd, "mid_block.resnets.0")
    out["mid_res_1"] = _resnet(sd, "mid_block.resnets.1")
    if transformer_layers[-1]:
        out["mid_attn"] = _transformer2d(sd, "mid_block.attentions.0",
                                         transformer_layers[-1])

    for i in range(n):
        level = n - 1 - i
        depth = transformer_layers[level]
        for j in range(layers_per_block + 1):
            out[f"up_{i}_res_{j}"] = _resnet(sd, f"up_blocks.{i}.resnets.{j}")
            if depth:
                out[f"up_{i}_attn_{j}"] = _transformer2d(
                    sd, f"up_blocks.{i}.attentions.{j}", depth)
        if i < n - 1:
            out[f"up_{i}_upsample"] = {
                "conv": _conv(sd, f"up_blocks.{i}.upsamplers.0.conv")}
    return out


def _map_attn_key(key: str) -> Optional[tuple]:
    """One diffusers transformer-attention param key -> flax param path.

    Handles the subset the detokenizer stage checkpoints may carry as
    DELTAS without a full UNet (the trainable cross-attn to_k/to_v set,
    reference adapter_modules.py:21-33 — and, symmetrically, any other
    attn1/attn2 linear).  Returns a tuple path or None if the key is not a
    transformer-attention linear."""
    import re

    m = re.fullmatch(
        r"(down_blocks\.(\d+)|mid_block|up_blocks\.(\d+))"
        r"\.attentions\.(\d+)\.transformer_blocks\.(\d+)"
        r"\.(attn[12])\.(to_q|to_k|to_v|to_out\.0)\.(weight|bias)", key)
    if not m:
        return None
    blk, down_i, up_i, attn_j, tblock, attn, proj, kind = m.groups()
    if blk == "mid_block":
        top = "mid_attn"
    elif down_i is not None:
        top = f"down_{down_i}_attn_{attn_j}"
    else:
        top = f"up_{up_i}_attn_{attn_j}"
    proj = "to_out" if proj == "to_out.0" else proj
    leaf = "kernel" if kind == "weight" else "bias"
    return (top, f"block_{tblock}", attn, proj, leaf)


def convert_sdxl_unet_deltas(sd: Mapping[str, Any]) -> Dict:
    """PARTIAL UNet state dict (e.g. only the trainable attn2 to_k/to_v
    from a detokenizer stage checkpoint) -> nested delta tree to overlay on
    full converted UNet params.  The reference achieves this with
    ``load_state_dict(ckpt, strict=False)`` (adapter_modules.py:62-65);
    keys that aren't transformer-attention linears are returned in the
    second element so callers can decide whether dropping them is an error.
    """
    out: Dict[str, Any] = {}
    skipped = []
    for key, val in sd.items():
        path = _map_attn_key(key)
        if path is None:
            skipped.append(key)
            continue
        node = out
        for part in path[:-1]:
            node = node.setdefault(part, {})
        arr = _np(val)
        node[path[-1]] = arr.T if path[-1] == "kernel" else arr
    return {"deltas": out, "skipped": skipped}


def _vae_attention(sd, p):
    """Handles both old (query/key/value/proj_attn) and new (to_q/..) names."""
    if f"{p}.to_q.weight" in sd:
        names = ("to_q", "to_k", "to_v", "to_out.0")
    else:
        names = ("query", "key", "value", "proj_attn")
    q, k, v, o = (_lin(sd, f"{p}.{nm}") for nm in names)
    return {"group_norm": _gn(sd, f"{p}.group_norm"),
            "to_q": q, "to_k": k, "to_v": v, "to_out": o}


def convert_sdxl_vae(sd: Mapping[str, Any],
                     channels=(128, 256, 512, 512),
                     layers_per_block: int = 2) -> Dict[str, Dict]:
    """Diffusers AutoencoderKL -> {"encoder": ..., "decoder": ...} params."""
    n = len(channels)
    enc: Dict[str, Any] = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "norm_out": _gn(sd, "encoder.conv_norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out"),
        "quant_conv": _conv(sd, "quant_conv"),
        "mid_res_0": _resnet(sd, "encoder.mid_block.resnets.0"),
        "mid_res_1": _resnet(sd, "encoder.mid_block.resnets.1"),
        "mid_attn": _vae_attention(sd, "encoder.mid_block.attentions.0"),
    }
    for i in range(n):
        for j in range(layers_per_block):
            enc[f"down_{i}_res_{j}"] = _resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}")
        if i < n - 1:
            enc[f"down_{i}_downsample"] = _conv(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")

    dec: Dict[str, Any] = {
        "post_quant_conv": _conv(sd, "post_quant_conv"),
        "conv_in": _conv(sd, "decoder.conv_in"),
        "norm_out": _gn(sd, "decoder.conv_norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
        "mid_res_0": _resnet(sd, "decoder.mid_block.resnets.0"),
        "mid_res_1": _resnet(sd, "decoder.mid_block.resnets.1"),
        "mid_attn": _vae_attention(sd, "decoder.mid_block.attentions.0"),
    }
    for i in range(n):
        for j in range(layers_per_block + 1):
            dec[f"up_{i}_res_{j}"] = _resnet(
                sd, f"decoder.up_blocks.{i}.resnets.{j}")
        if i < n - 1:
            dec[f"up_{i}_upsample"] = _conv(
                sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
    return {"encoder": enc, "decoder": dec}
