"""Generate converter manifests — the expected key -> shape sets for the
four SEED-X release artifacts (reference README.md:74-158) — by
instantiating the REFERENCE torch modules at full geometry on the torch
meta device (zero memory) and dumping their state-dict schemas.

Artifacts -> manifest JSON (written to seedx_tpu/utils/manifests/):

  qwen_vit.json      pretrained/QwenViT/qwen_vit_G.pt
                     (reference qwen_visual.VisionTransformerWithAttnPool,
                      configs/visual_encoder/qwen_vitg_448.yaml geometry)
  agent.json         pretrained/seed_x*/agent/pytorch_model.bin
                     (reference seed_x.ContinuousLVLM over the PEFT-fork-
                      wrapped modeling_llama_xformer.LlamaForCausalLM,
                      configs/clm_models/agent_seed_x.yaml +
                      llm_seed_x_lora.yaml geometry, vocab 32330)
  llm.json           pretrained/seed_x*/llm (HF-layout shards)
                     (reference LlamaForCausalLM base, vocab 32330)
  detokenizer.json   pretrained/seed_detokenizer/*/pytorch_model.bin
                     (reference detokenizer resampler.ResamplerXLV2,
                      configs/sdxl_adapter/...l4_q64...yaml geometry; the
                      adapter's trainable UNet cross-attn to_k/to_v keys are
                      listed as optional)
  sdxl_unet.json     pretrained/stable-diffusion-xl-base-1.0/unet
  sdxl_vae.json      .../vae
                     (tests/torch_sdxl_oracle mirrors the diffusers key
                      schema exactly — that equivalence is what
                      tests/test_weights.py pins)

The JSON schema: {"keys": {name: [shape...]}, "optional": [...],
"ignored": [...]}.  "ignored" = keys the converters deliberately skip
(deterministic buffers recomputed in JAX: sincos pos_embed params, rotary
inv_freq); "optional" = keys that may or may not be present.

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/gen_manifests.py
(needs /root/reference and the tests/ oracle loaders).
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import types

import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, REPO)
OUT_DIR = os.path.join(REPO, "seedx_tpu", "utils", "manifests")

import oracles  # noqa: E402  (tests/oracles.py)


def sd_shapes(module: torch.nn.Module, prefix: str = ""):
    return {prefix + k: list(v.shape)
            for k, v in module.state_dict().items()}


def write(name: str, keys, optional=(), ignored=()):
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, name + ".json")
    payload = {"keys": {k: keys[k] for k in sorted(keys)},
               "optional": sorted(optional), "ignored": sorted(ignored)}
    with open(path, "w") as f:
        json.dump(payload, f, indent=0, sort_keys=True)
    print(f"{name}: {len(keys)} keys -> {path}")


# ---------------------------------------------------------------------------
# stubs for CUDA-era imports (xformers, deepspeed) — construction only ever
# touches module __init__, never the stubbed kernels
# ---------------------------------------------------------------------------

class _NoopCtx:
    def __init__(self, *a, **k):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _stub(name: str, **attrs):
    if name in sys.modules:
        return sys.modules[name], False
    import importlib.machinery
    mod = types.ModuleType(name)
    # a real-looking __spec__ keeps importlib.util.find_spec() callers
    # (accelerate's is_deepspeed_available) working
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod, True


@contextlib.contextmanager
def cuda_stubs():
    added = []
    for name, attrs in [
        ("xformers", {}),
        ("xformers.ops", {"memory_efficient_attention": lambda *a, **k: None,
                          "LowerTriangularMask": object}),
        ("deepspeed", {}),
        ("deepspeed.zero", {"GatheredParameters": _NoopCtx}),
        # removed from transformers >= 4.33; the fork only needs the probe
        ("transformers.deepspeed",
         {"is_deepspeed_zero3_enabled": lambda: False}),
    ]:
        mod, new = _stub(name, **attrs)
        if new:
            added.append(name)
    if "deepspeed" in added:
        sys.modules["deepspeed"].zero = sys.modules["deepspeed.zero"]
    if "xformers" in added:
        sys.modules["xformers"].ops = sys.modules["xformers.ops"]
    try:
        yield
    finally:
        for name in added:
            sys.modules.pop(name, None)


def _load_ref(name, rel):
    return oracles._load_file(name, f"/root/reference/{rel}")


def _load_ref_mllm(submodule):
    """Load a module from the reference mllm package with its relative
    imports working (seed_x.py does ``from .generation import ...``): register
    a synthetic package whose __path__ is the mllm directory, then import the
    submodule through the normal machinery.  Caller must hold cuda_stubs()
    (utils.py imports deepspeed)."""
    import importlib
    pkg_name = "ref_mllm"
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = ["/root/reference/src/models/mllm"]
        sys.modules[pkg_name] = pkg
    return importlib.import_module(f"{pkg_name}.{submodule}")


# ---------------------------------------------------------------------------
# 1. Qwen ViT (qwen_vit_G.pt)
# ---------------------------------------------------------------------------

def gen_qwen_vit():
    qv = oracles.load_reference_qwen_visual()
    with torch.device("meta"):
        vit = qv.VisionTransformerWithAttnPool(
            image_size=448, patch_size=14, width=1664, layers=48, heads=16,
            mlp_ratio=4.9231, n_queries=256, output_dim=4096)
    keys = sd_shapes(vit)
    # sincos pos_embed is a frozen deterministic param the JAX model
    # recomputes (vit.py); converters skip it
    ignored = [k for k in keys if k.endswith("attn_pool.pos_embed")]
    for k in ignored:
        keys.pop(k)
    write("qwen_vit", keys, ignored=ignored)


# ---------------------------------------------------------------------------
# 2+3. Agent checkpoint (PEFT-wrapped llama + resamplers) and base LLM dir
# ---------------------------------------------------------------------------

def _ref_llama(vocab=32330):
    """Reference modeling_llama_xformer.LlamaForCausalLM, 13B geometry,
    meta device."""
    with cuda_stubs():
        mx = _load_ref("ref_modeling_llama_xformer",
                       "src/models/mllm/modeling_llama_xformer.py")
    from transformers.models.llama.configuration_llama import LlamaConfig
    cfg = LlamaConfig(vocab_size=vocab, hidden_size=5120,
                      intermediate_size=13824, num_hidden_layers=40,
                      num_attention_heads=40, num_key_value_heads=40,
                      max_position_embeddings=2048)
    with torch.device("meta"):
        llm = mx.LlamaForCausalLM(cfg)
    return llm


def gen_llm():
    llm = _ref_llama()
    keys = sd_shapes(llm)
    # rotary inv_freq buffers (persistent in the 4.30-era module) are
    # deterministic; HF-era exports may or may not serialize them
    rot = [k for k in keys if k.endswith("rotary_emb.inv_freq")]
    for k in rot:
        keys.pop(k)
    write("llm", keys, optional=rot, ignored=rot)


def gen_agent():
    with cuda_stubs():
        sys.modules.pop("peft", None)       # force the vendored fork
        sys.path.insert(0, "/root/reference/proj/peft/src")
        try:
            import peft as ref_peft
            llm = _ref_llama()
            lora_cfg = ref_peft.LoraConfig(
                r=32, lora_alpha=32, lora_dropout=0.05,
                target_modules=["q_proj", "v_proj", "k_proj", "o_proj",
                                "gate_proj", "down_proj", "up_proj"],
                modules_to_save=["input_layernorm",
                                 "post_attention_layernorm", "norm"],
                task_type="CAUSAL_LM")
            with torch.device("meta"):
                peft_llm = ref_peft.get_peft_model(llm, lora_cfg)
        finally:
            sys.path.remove("/root/reference/proj/peft/src")
            sys.modules.pop("peft", None)

        qv = oracles.load_reference_qwen_visual()
        sx = _load_ref_mllm("seed_x")
        with torch.device("meta"):
            agent = sx.ContinuousLVLM(
                llm=peft_llm,
                input_resampler=qv.Resampler(grid_size=8, embed_dim=5120,
                                             num_heads=32, kv_dim=4096),
                output_resampler=qv.Resampler(grid_size=8, embed_dim=4096,
                                              num_heads=32, kv_dim=5120),
                lm_loss_scale=1.0, rec_loss_scale=6.0, add_patch_pos=True,
                vit_down=True, mse=True)
    keys = sd_shapes(agent)
    ignored = [k for k in keys
               if k.endswith("rotary_emb.inv_freq")
               or k.endswith("resampler.pos_embed")]
    for k in ignored:
        keys.pop(k)
    write("agent", keys, ignored=ignored)


# ---------------------------------------------------------------------------
# 4. De-tokenizer (ResamplerXLV2 + trainable UNet cross-attn keys)
# ---------------------------------------------------------------------------

def gen_detokenizer():
    rs = oracles.load_reference_detok_resampler()
    with torch.device("meta"):
        res = rs.ResamplerXLV2(dim=1024, depth=4, dim_head=64, heads=16,
                               num_queries=64, embedding_dim=4096,
                               output1_dim=768, output2_dim=1280, ff_mult=4,
                               normalize=False)
    keys = sd_shapes(res, prefix="resampler.")

    # the adapter trains UNet cross-attn to_k/to_v too
    # (reference adapter_modules.py:21-33); their presence in the stage
    # checkpoint is optional (init_pipe reloads the base UNet otherwise)
    import torch_sdxl_oracle as so
    with torch.device("meta"):
        unet = so.UNet2DConditionModel()
    optional = ["unet." + k for k in unet.state_dict()
                if ".attn2.to_k." in k or ".attn2.to_v." in k]
    write("detokenizer", keys, optional=optional)


# ---------------------------------------------------------------------------
# 5. SDXL base (diffusers UNet + VAE schemas via the torch oracle)
# ---------------------------------------------------------------------------

def gen_sdxl():
    import torch_sdxl_oracle as so
    with torch.device("meta"):
        unet = so.UNet2DConditionModel()
        vae = so.AutoencoderKL()
    write("sdxl_unet", sd_shapes(unet))
    write("sdxl_vae", sd_shapes(vae))


if __name__ == "__main__":
    gen_qwen_vit()
    gen_llm()
    gen_agent()
    gen_detokenizer()
    gen_sdxl()
