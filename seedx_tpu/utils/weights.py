"""PyTorch checkpoint -> JAX param-tree converters.

Covers the four release artifacts a SEED-X user has on disk
(reference README.md:74-158):
  1. QwenViT ``qwen_vit_G.pt``                  -> VisionTransformer params,
  2. LLaMA2 HF shards (+ agent ``pytorch_model.bin`` with LoRA, resamplers,
     layernorms)                                -> LlamaForCausalLM / agent,
  3. detokenizer ``pytorch_model.bin``          -> ResamplerXL (+ UNet deltas),
  4. SDXL base (diffusers UNet + VAE)           -> UNet2DCondition / VAE.

Conventions: torch Linear stores [out, in] -> flax kernel [in, out]
(transpose); torch Conv2d [out, in, kh, kw] -> flax [kh, kw, in, out];
torch LayerNorm weight/bias -> scale/bias.  Vocab resize mean-inits new
input rows and mean*3 output rows (reference: peft_models.py:69-84).

Everything is numpy in / numpy out — no device memory is touched, so a 13B
conversion streams through host RAM.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional

import numpy as np

Array = np.ndarray
StateDict = Mapping[str, Any]


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    import torch

    if isinstance(t, torch.Tensor):
        return t.detach().to(torch.float32).cpu().numpy()
    return np.asarray(t)


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .bin/.pt (torch pickle) or .safetensors file to numpy."""
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        out = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return {k: _np(v) for k, v in sd.items()}


# Single-file names HF/diffusers exporters use, in probe order.
_SINGLE_FILE_NAMES = (
    "model.safetensors", "pytorch_model.bin",
    "diffusion_pytorch_model.safetensors", "diffusion_pytorch_model.bin",
)
_INDEX_NAMES = ("model.safetensors.index.json",
                "pytorch_model.bin.index.json",
                "diffusion_pytorch_model.safetensors.index.json")


def load_checkpoint_auto(path: str) -> Dict[str, np.ndarray]:
    """Load a checkpoint FILE or a HF-layout DIRECTORY to numpy.

    Directories are how the release artifacts ship (reference
    README.md:74-87): ``pretrained/seed_x*/llm`` is an HF save_pretrained
    dir (index JSON + weight shards), ``stable-diffusion-xl-base-1.0/unet``
    a diffusers dir (single weights file).  Probe order: index JSON
    (sharded) -> known single-file names -> any lone .safetensors/.bin.
    """
    import os

    if not os.path.isdir(path):
        return load_torch_checkpoint(path)
    for idx_name in _INDEX_NAMES:
        idx_path = os.path.join(path, idx_name)
        if os.path.exists(idx_path):
            import json

            with open(idx_path) as f:
                weight_map = json.load(f)["weight_map"]
            out: Dict[str, np.ndarray] = {}
            for shard in sorted(set(weight_map.values())):
                out.update(load_torch_checkpoint(os.path.join(path, shard)))
            return out
    for fname in _SINGLE_FILE_NAMES:
        fpath = os.path.join(path, fname)
        if os.path.exists(fpath):
            return load_torch_checkpoint(fpath)
    lone = [f for f in sorted(os.listdir(path))
            if f.endswith((".safetensors", ".bin", ".pt"))]
    if len(lone) == 1:
        return load_torch_checkpoint(os.path.join(path, lone[0]))
    if len(lone) > 1:   # index-less shard dump: merge in name order
        out = {}
        for f in lone:
            out.update(load_torch_checkpoint(os.path.join(path, f)))
        return out
    raise FileNotFoundError(
        f"no weight files found under checkpoint directory {path!r} "
        f"(looked for {_INDEX_NAMES + _SINGLE_FILE_NAMES} and lone "
        f".safetensors/.bin/.pt files)")


def _linear(sd, key):
    """torch Linear weight -> flax kernel."""
    return _np(sd[key]).T


def _ln(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def _maybe_bias(params, sd, key, name="bias"):
    if key in sd:
        params[name] = _np(sd[key])
    return params


# ---------------------------------------------------------------------------
# Qwen ViT  (reference: src/models/tokenizer/qwen_visual.py)
# ---------------------------------------------------------------------------

def _split_mha_in_proj(weight: np.ndarray, bias: Optional[np.ndarray]):
    """torch nn.MultiheadAttention packed qkv -> separate flax projections."""
    w = _np(weight)
    dim = w.shape[0] // 3
    wq, wk, wv = w[:dim], w[dim:2 * dim], w[2 * dim:]
    out = {
        "q_proj": {"kernel": wq.T}, "k_proj": {"kernel": wk.T},
        "v_proj": {"kernel": wv.T},
    }
    if bias is not None:
        b = _np(bias)
        out["q_proj"]["bias"] = b[:dim]
        out["k_proj"]["bias"] = b[dim:2 * dim]
        out["v_proj"]["bias"] = b[2 * dim:]
    return out


def convert_resampler(sd: StateDict, prefix: str = "") -> Dict:
    """Qwen-style Resampler (qwen_visual.py:94-149) -> seedx params."""
    p = lambda k: f"{prefix}{k}"
    out: Dict[str, Any] = {
        "query": _np(sd[p("query")]),
        "ln_q": _ln(sd, p("ln_q")),
        "ln_kv": _ln(sd, p("ln_kv")),
    }
    attn = _split_mha_in_proj(sd[p("attn.in_proj_weight")],
                              sd.get(p("attn.in_proj_bias")))
    attn["out_proj"] = {"kernel": _linear(sd, p("attn.out_proj.weight")),
                        "bias": _np(sd[p("attn.out_proj.bias")])}
    out["attn"] = attn
    if p("kv_proj.weight") in sd:
        out["kv_proj"] = {"kernel": _linear(sd, p("kv_proj.weight"))}
    return out


def _deinterleave_qkv(w: np.ndarray, heads: int) -> np.ndarray:
    """Reference ``VisualAttention.in_proj`` packs its output rows PER HEAD
    as [q_h | k_h | v_h] (qwen_visual.py:186-196: view to [s,b,heads,3*hd]
    then split) — NOT torch-MHA's [all-q | all-k | all-v].  Re-order rows to
    the standard packed layout our block's ``jnp.split(qkv, 3)`` expects."""
    e3 = w.shape[0]
    hd = e3 // (3 * heads)
    grouped = w.reshape(heads, 3, hd, *w.shape[1:])
    return np.ascontiguousarray(
        grouped.transpose(1, 0, *range(2, grouped.ndim))).reshape(w.shape)


def convert_qwen_vit(sd: StateDict, num_layers: int = 48,
                     num_heads: int = 16) -> Dict:
    """qwen_vit_G.pt -> VisionTransformer params (stacked scan layout)."""
    out: Dict[str, Any] = {
        "conv1": {"kernel": _np(sd["conv1.weight"]).transpose(2, 3, 1, 0)},
        "positional_embedding": _np(sd["positional_embedding"]),
        "ln_pre": _ln(sd, "ln_pre"),
        "ln_post": _ln(sd, "ln_post"),
        "proj": _np(sd["proj"]),
    }

    def stack(fn):
        return np.stack([fn(i) for i in range(num_layers)])

    blk = "transformer.resblocks.{}."
    out["blocks"] = {
        "ln_1": {"scale": stack(lambda i: _np(sd[blk.format(i) + "ln_1.weight"])),
                 "bias": stack(lambda i: _np(sd[blk.format(i) + "ln_1.bias"]))},
        "ln_2": {"scale": stack(lambda i: _np(sd[blk.format(i) + "ln_2.weight"])),
                 "bias": stack(lambda i: _np(sd[blk.format(i) + "ln_2.bias"]))},
        "in_proj": {
            "kernel": stack(lambda i: _deinterleave_qkv(
                _np(sd[blk.format(i) + "attn.in_proj.weight"]), num_heads).T),
            "bias": stack(lambda i: _deinterleave_qkv(
                _np(sd[blk.format(i) + "attn.in_proj.bias"]), num_heads)),
        },
        "out_proj": {
            "kernel": stack(lambda i: _np(sd[blk.format(i) + "attn.out_proj.weight"]).T),
            "bias": stack(lambda i: _np(sd[blk.format(i) + "attn.out_proj.bias"])),
        },
        "mlp": {
            "c_fc": {"kernel": stack(lambda i: _np(sd[blk.format(i) + "mlp.c_fc.weight"]).T),
                     "bias": stack(lambda i: _np(sd[blk.format(i) + "mlp.c_fc.bias"]))},
            "c_proj": {"kernel": stack(lambda i: _np(sd[blk.format(i) + "mlp.c_proj.weight"]).T),
                       "bias": stack(lambda i: _np(sd[blk.format(i) + "mlp.c_proj.bias"]))},
        },
    }
    out["attn_pool"] = convert_resampler(sd, "attn_pool.")
    if "patch_pos_embed" in sd:
        out["patch_pos_embed"] = _np(sd["patch_pos_embed"])
    return out


# ---------------------------------------------------------------------------
# LLaMA  (reference: src/models/mllm/modeling_llama_xformer.py + HF layout)
# ---------------------------------------------------------------------------

def resize_vocab(embedding: np.ndarray, lm_head: np.ndarray,
                 new_vocab: int):
    """Mean-init new input rows; mean*3 new output rows
    (reference: peft_models.py:69-84)."""
    old = embedding.shape[0]
    if new_vocab <= old:
        return embedding[:new_vocab], lm_head[:new_vocab]
    mean_in = embedding.mean(axis=0, keepdims=True)
    mean_out = lm_head.mean(axis=0, keepdims=True) * 3
    pad_in = np.repeat(mean_in, new_vocab - old, axis=0)
    pad_out = np.repeat(mean_out, new_vocab - old, axis=0)
    return (np.concatenate([embedding, pad_in], axis=0),
            np.concatenate([lm_head, pad_out], axis=0))


def convert_llama_hf(sd: StateDict, num_layers: int = 40,
                     vocab_size: int = 32330, pad_to: int = 0) -> Dict:
    """HF LLaMA state dict -> LlamaForCausalLM params (stacked scan layout).

    Keys may carry HF ("model.layers.N...") or PEFT-wrapped
    ("base_model.model.model.layers.N...") prefixes; both are normalised.
    ``pad_to``: zero-pad the embedding/lm_head vocab rows up to this size
    (the TP-divisibility padding, LlamaConfig.vocab_pad_to — pad logits are
    masked in the model, so values are inert).
    """
    norm = {}
    for k, v in sd.items():
        k = k.replace("base_model.model.", "")
        # PEFT wraps targeted Linears: strip ".base_layer" and
        # modules_to_save indirection
        k = k.replace(".base_layer.weight", ".weight")
        k = re.sub(r"\.modules_to_save\.default", "", k)
        k = re.sub(r"\.original_module", "", k)
        norm[k] = v
    sd = norm

    embedding = _np(sd["model.embed_tokens.weight"])
    lm_head = _np(sd["lm_head.weight"])
    if embedding.shape[0] != vocab_size:
        embedding, lm_head = resize_vocab(embedding, lm_head, vocab_size)
    if pad_to > vocab_size:
        pad = pad_to - vocab_size
        embedding = np.concatenate(
            [embedding, np.zeros((pad, embedding.shape[1]),
                                 embedding.dtype)])
        lm_head = np.concatenate(
            [lm_head, np.zeros((pad, lm_head.shape[1]), lm_head.dtype)])

    def stack_linear(pattern):
        return np.stack([_np(sd[pattern.format(i)]).T
                         for i in range(num_layers)])

    def stack_vec(pattern):
        return np.stack([_np(sd[pattern.format(i)])
                         for i in range(num_layers)])

    lyr = "model.layers.{}."
    layer_params: Dict[str, Any] = {}
    for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
        layer_params[proj] = {"kernel": stack_linear(
            lyr + f"self_attn.{proj}.weight")}
    for proj in ("gate_proj", "up_proj", "down_proj"):
        layer_params[proj] = {"kernel": stack_linear(lyr + f"mlp.{proj}.weight")}
    layer_params["input_layernorm"] = {
        "scale": stack_vec(lyr + "input_layernorm.weight")}
    layer_params["post_attention_layernorm"] = {
        "scale": stack_vec(lyr + "post_attention_layernorm.weight")}

    # LoRA factors, if present (agent checkpoints): lora_A [r, in] -> a [in, r]
    def try_stack_lora(proj, which):
        keys = [lyr.format(i) + f"self_attn.{proj}.lora_{which}.default.weight"
                for i in range(num_layers)]
        alt = [lyr.format(i) + f"mlp.{proj}.lora_{which}.default.weight"
               for i in range(num_layers)]
        use = keys if keys[0] in sd else alt
        if use[0] not in sd:
            return None
        mats = [_np(sd[k]) for k in use]
        if which == "A":
            return np.stack([m.T for m in mats])   # [L, in, r]
        return np.stack([m.T for m in mats])       # [L, r, out]

    for proj in ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
                 "up_proj", "down_proj"):
        a = try_stack_lora(proj, "A")
        b = try_stack_lora(proj, "B")
        if a is not None and b is not None:
            layer_params[proj]["lora_a"] = a
            layer_params[proj]["lora_b"] = b

    return {
        "embed_tokens": {"embedding": embedding},
        "model": {
            "layers": {"layer": layer_params},
            "norm": {"scale": _np(sd["model.norm.weight"])},
        },
        "lm_head": {"kernel": lm_head.T},
    }


def convert_agent_checkpoint(sd: StateDict) -> Dict:
    """SEED-X agent ``pytorch_model.bin`` -> partial ContinuousLVLM params
    (input/output resamplers + patch_pos_embed; llm.* keys are returned
    separately under 'llm_state_dict' for convert_llama_hf)."""
    out: Dict[str, Any] = {}
    if "patch_pos_embed" in sd:
        out["patch_pos_embed"] = _np(sd["patch_pos_embed"])
    for name in ("input_resampler", "output_resampler"):
        if any(k.startswith(name + ".") for k in sd):
            out[name] = convert_resampler(sd, name + ".")
    llm_sd = {k[len("llm."):]: v for k, v in sd.items() if k.startswith("llm.")}
    if llm_sd:
        out["llm_state_dict"] = llm_sd
    return out


# ---------------------------------------------------------------------------
# Detokenizer resampler  (reference: src/models/detokenizer/resampler.py)
# ---------------------------------------------------------------------------

def convert_detokenizer_resampler(sd: StateDict, depth: int = 4,
                                  prefix: str = "resampler.") -> Dict:
    p = lambda k: f"{prefix}{k}"
    out: Dict[str, Any] = {
        "latents": _np(sd[p("latents")]),
        "proj_in": {"kernel": _linear(sd, p("proj_in.weight")),
                    "bias": _np(sd[p("proj_in.bias")])},
        "norm_out": _ln(sd, p("norm_out")),
        "unet_proj_1": {"kernel": _linear(sd, p("unet_proj_1.weight")),
                        "bias": _np(sd[p("unet_proj_1.bias")])},
        "unet_proj_2": {"kernel": _linear(sd, p("unet_proj_2.weight")),
                        "bias": _np(sd[p("unet_proj_2.bias")])},
    }
    for i in range(depth):
        # torch: layers.{i}.0 = PerceiverAttention, layers.{i}.1 = FeedForward
        att = f"layers.{i}.0."
        out[f"attn_{i}"] = {
            "norm1": _ln(sd, p(att + "norm1")),
            "norm2": _ln(sd, p(att + "norm2")),
            "to_q": {"kernel": _linear(sd, p(att + "to_q.weight"))},
            "to_kv": {"kernel": _linear(sd, p(att + "to_kv.weight"))},
            "to_out": {"kernel": _linear(sd, p(att + "to_out.weight"))},
        }
        ff = f"layers.{i}.1."
        out[f"ff_{i}"] = {
            "norm": _ln(sd, p(ff + "0")),
            "fc1": {"kernel": _linear(sd, p(ff + "1.weight"))},
            "fc2": {"kernel": _linear(sd, p(ff + "3.weight"))},
        }
    ap = "unet_attnpool."
    out["unet_attnpool"] = {
        "positional_embedding": _np(sd[p(ap + "positional_embedding")]),
        "q_proj": {"kernel": _linear(sd, p(ap + "q_proj.weight")),
                   "bias": _np(sd[p(ap + "q_proj.bias")])},
        "k_proj": {"kernel": _linear(sd, p(ap + "k_proj.weight")),
                   "bias": _np(sd[p(ap + "k_proj.bias")])},
        "v_proj": {"kernel": _linear(sd, p(ap + "v_proj.weight")),
                   "bias": _np(sd[p(ap + "v_proj.bias")])},
        "c_proj": {"kernel": _linear(sd, p(ap + "c_proj.weight")),
                   "bias": _np(sd[p(ap + "c_proj.bias")])},
    }
    return out


def extract_qwen_vit_from_qwen_vl(sd: StateDict) -> Dict[str, np.ndarray]:
    """Extract the visual tower from a full Qwen-VL-Chat checkpoint
    (reference tool: src/tools/reload_qwen_vit.py — filters
    ``transformer.visual.*`` into qwen_vit_G.pt).  Feed the result to
    :func:`convert_qwen_vit`."""
    prefix = "transformer.visual."
    return {k[len(prefix):]: _np(v) for k, v in sd.items()
            if k.startswith(prefix)}
