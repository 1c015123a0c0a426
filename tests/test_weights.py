"""Weight-converter tests: synthetic torch-layout state dicts -> JAX trees.

The structural tests assert the converted tree exactly matches the flax
module's init tree (key set + shapes) — the load path used with real
checkpoints.  The numerical test uses torch.nn.MultiheadAttention as an
independent oracle for the resampler conversion (packed qkv split +
transposes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from seedx_tpu.utils import weights as W
from seedx_tpu.utils.sdxl_weights import convert_sdxl_unet, convert_sdxl_vae


def _tree_shapes(tree):
    import flax
    from flax import linen as nn

    tree = nn.meta.unbox(tree)
    return {k: tuple(v.shape) for k, v in
            flax.traverse_util.flatten_dict(tree, sep="/").items()}


# ---------------------------------------------------------------------------
# resampler: numerical parity against torch.nn.MultiheadAttention
# ---------------------------------------------------------------------------

def test_resampler_conversion_matches_torch_mha():
    torch.manual_seed(0)
    dim, kv_dim, heads, nq, nkv = 32, 16, 4, 4, 9

    # torch-side modules with the reference's parameter layout
    # (qwen_visual.py:94-149)
    mha = torch.nn.MultiheadAttention(dim, heads)
    ln_q = torch.nn.LayerNorm(dim)
    ln_kv = torch.nn.LayerNorm(dim)
    kv_proj = torch.nn.Linear(kv_dim, dim, bias=False)
    query = torch.randn(nq, dim)
    for m in (ln_q, ln_kv):
        torch.nn.init.normal_(m.weight, 1.0, 0.1)
        torch.nn.init.normal_(m.bias, 0.0, 0.1)

    from seedx_tpu.models.resampler import Resampler, sincos_2d_pos_embed

    # torch forward replicating the reference dataflow
    x = torch.randn(2, nkv, kv_dim)
    pos = torch.tensor(sincos_2d_pos_embed(dim, 2), dtype=torch.float32)
    kv_pos = torch.tensor(
        np.asarray(__import__("seedx_tpu.models.resampler",
                              fromlist=["resize_pos_embed"]).resize_pos_embed(
            jnp.asarray(sincos_2d_pos_embed(dim, 2), jnp.float32), nkv)))
    with torch.no_grad():
        h = ln_kv(kv_proj(x)).permute(1, 0, 2)          # [nkv, B, dim]
        q = ln_q(query)
        q_in = (q + pos).unsqueeze(1).repeat(1, 2, 1)   # [nq, B, dim]
        k_in = h + kv_pos.unsqueeze(1)
        ref, _ = mha(q_in, k_in, h)
        ref = ref.permute(1, 0, 2).numpy()

    # convert: build the reference-layout state dict
    sd = {
        "query": query,
        "kv_proj.weight": kv_proj.weight,
        "ln_q.weight": ln_q.weight, "ln_q.bias": ln_q.bias,
        "ln_kv.weight": ln_kv.weight, "ln_kv.bias": ln_kv.bias,
        "attn.in_proj_weight": mha.in_proj_weight,
        "attn.in_proj_bias": mha.in_proj_bias,
        "attn.out_proj.weight": mha.out_proj.weight,
        "attn.out_proj.bias": mha.out_proj.bias,
    }
    params = W.convert_resampler(sd)

    model = Resampler(grid_size=2, embed_dim=dim, num_heads=heads,
                      kv_dim=kv_dim, dtype=jnp.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((2, nkv, kv_dim)))
    assert _tree_shapes(params) == _tree_shapes(init["params"])

    out = model.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


# ---------------------------------------------------------------------------
# structural round trips
# ---------------------------------------------------------------------------

def test_convert_llama_structure_and_resize():
    from seedx_tpu.models.llama import LlamaForCausalLM, llama_debug

    cfg = llama_debug(hidden_size=32, intermediate_size=64, num_layers=2,
                      num_heads=2, num_kv_heads=2, vocab_size=1010,
                      lora_rank=4)
    rng = np.random.default_rng(0)

    sd = {
        "model.embed_tokens.weight": rng.normal(size=(1000, 32)),
        "lm_head.weight": rng.normal(size=(1000, 32)),
        "model.norm.weight": np.ones(32),
    }
    for i in range(2):
        for proj, shape in (("q_proj", (32, 32)), ("k_proj", (32, 32)),
                            ("v_proj", (32, 32)), ("o_proj", (32, 32))):
            sd[f"model.layers.{i}.self_attn.{proj}.weight"] = \
                rng.normal(size=shape)
            sd[f"model.layers.{i}.self_attn.{proj}.lora_A.default.weight"] = \
                rng.normal(size=(4, 32))
            sd[f"model.layers.{i}.self_attn.{proj}.lora_B.default.weight"] = \
                np.zeros((32, 4))
        for proj, shape in (("gate_proj", (64, 32)), ("up_proj", (64, 32)),
                            ("down_proj", (32, 64))):
            sd[f"model.layers.{i}.mlp.{proj}.weight"] = rng.normal(size=shape)
            sd[f"model.layers.{i}.mlp.{proj}.lora_A.default.weight"] = \
                rng.normal(size=(4, shape[1]))
            sd[f"model.layers.{i}.mlp.{proj}.lora_B.default.weight"] = \
                np.zeros((shape[0], 4))
        sd[f"model.layers.{i}.input_layernorm.weight"] = np.ones(32)
        sd[f"model.layers.{i}.post_attention_layernorm.weight"] = np.ones(32)

    params = W.convert_llama_hf(sd, num_layers=2, vocab_size=1010)
    # resize: rows 1000..1010 mean-init (input) / mean*3 (output)
    emb = params["embed_tokens"]["embedding"]
    assert emb.shape == (1010, 32)
    np.testing.assert_allclose(emb[1005], emb[:1000].mean(0), rtol=1e-5)
    head = params["lm_head"]["kernel"]
    np.testing.assert_allclose(head[:, 1005], head[:, :1000].mean(1) * 3,
                               rtol=1e-5)

    model = LlamaForCausalLM(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(8), (1, 8))
    init = model.init(jax.random.PRNGKey(0), ids, positions,
                      method="init_all")
    from flax import linen as nn

    assert _tree_shapes(params) == _tree_shapes(nn.meta.unbox(init["params"]))
    # loaded params run
    logits, _, _ = model.apply({"params": params}, jnp.zeros((1, 8, 32)),
                               positions, jnp.ones((1, 8), bool))
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_convert_qwen_vit_structure(tiny_vit_cfg):
    import dataclasses

    from seedx_tpu.models.vit import VisionTransformer

    cfg = tiny_vit_cfg
    rng = np.random.default_rng(0)
    w, L, mlp = cfg.width, cfg.layers, cfg.mlp_hidden
    sd = {
        "conv1.weight": rng.normal(size=(w, 3, cfg.patch_size, cfg.patch_size)),
        "positional_embedding": rng.normal(size=(cfg.pos_embed_len, w)),
        "ln_pre.weight": np.ones(w), "ln_pre.bias": np.zeros(w),
        "ln_post.weight": np.ones(cfg.output_dim),
        "ln_post.bias": np.zeros(cfg.output_dim),
        "proj": rng.normal(size=(cfg.output_dim, cfg.output_dim)),
        "attn_pool.query": rng.normal(size=(cfg.n_queries, cfg.output_dim)),
        "attn_pool.kv_proj.weight": rng.normal(size=(cfg.output_dim, w)),
        "attn_pool.ln_q.weight": np.ones(cfg.output_dim),
        "attn_pool.ln_q.bias": np.zeros(cfg.output_dim),
        "attn_pool.ln_kv.weight": np.ones(cfg.output_dim),
        "attn_pool.ln_kv.bias": np.zeros(cfg.output_dim),
        "attn_pool.attn.in_proj_weight":
            rng.normal(size=(3 * cfg.output_dim, cfg.output_dim)),
        "attn_pool.attn.in_proj_bias": np.zeros(3 * cfg.output_dim),
        "attn_pool.attn.out_proj.weight":
            rng.normal(size=(cfg.output_dim, cfg.output_dim)),
        "attn_pool.attn.out_proj.bias": np.zeros(cfg.output_dim),
    }
    for i in range(L):
        p = f"transformer.resblocks.{i}."
        sd[p + "ln_1.weight"] = np.ones(w)
        sd[p + "ln_1.bias"] = np.zeros(w)
        sd[p + "ln_2.weight"] = np.ones(w)
        sd[p + "ln_2.bias"] = np.zeros(w)
        sd[p + "attn.in_proj.weight"] = rng.normal(size=(3 * w, w))
        sd[p + "attn.in_proj.bias"] = np.zeros(3 * w)
        sd[p + "attn.out_proj.weight"] = rng.normal(size=(w, w))
        sd[p + "attn.out_proj.bias"] = np.zeros(w)
        sd[p + "mlp.c_fc.weight"] = rng.normal(size=(mlp, w))
        sd[p + "mlp.c_fc.bias"] = np.zeros(mlp)
        sd[p + "mlp.c_proj.weight"] = rng.normal(size=(w, mlp))
        sd[p + "mlp.c_proj.bias"] = np.zeros(w)

    params = W.convert_qwen_vit(sd, num_layers=L)
    model = VisionTransformer(cfg, remat=False)
    img = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    init = model.init(jax.random.PRNGKey(0), img)
    from flax import linen as nn

    assert _tree_shapes(params) == _tree_shapes(nn.meta.unbox(init["params"]))
    out = model.apply({"params": params}, img)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def _synthesize_sd_from_shapes(keys_shapes):
    rng = np.random.default_rng(0)
    return {k: rng.normal(size=s).astype(np.float32)
            for k, s in keys_shapes.items()}


def test_convert_sdxl_unet_structure():
    from flax import linen as nn

    from seedx_tpu.models.sdxl.unet import UNet2DCondition, sdxl_debug_unet

    cfg = sdxl_debug_unet()
    model = UNet2DCondition(cfg)
    sample = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 4, cfg.cross_attention_dim))
    pooled = jnp.zeros((1, 64))
    tids = jnp.zeros((1, 6))
    init = model.init(jax.random.PRNGKey(0), sample, jnp.array([1.0]), ctx,
                      pooled, tids)
    target = _tree_shapes(nn.meta.unbox(init["params"]))

    # build a diffusers-layout state dict by inverse-mapping the target
    sd = {}
    import flax

    def torch_shape(flax_key, shape):
        leaf = flax_key.split("/")[-1]
        if leaf == "kernel" and len(shape) == 4:   # conv
            return (shape[3], shape[2], shape[0], shape[1])
        if leaf == "kernel":
            return (shape[1], shape[0])
        return shape

    # enumerate via the converter's expected keys: easiest correct check is
    # running the converter against a dict built from the diffusers names;
    # we construct those names from our flax names.
    mapping = []
    for k, shape in target.items():
        parts = k.split("/")
        name = None
        import re as _re

        def conv_like(prefix):
            return prefix

        k2 = k
        k2 = k2.replace("time_embed_1", "time_embedding.linear_1")
        k2 = k2.replace("time_embed_2", "time_embedding.linear_2")
        k2 = k2.replace("add_embed_1", "add_embedding.linear_1")
        k2 = k2.replace("add_embed_2", "add_embedding.linear_2")
        k2 = _re.sub(r"down_(\d+)_res_(\d+)", r"down_blocks.\1.resnets.\2", k2)
        k2 = _re.sub(r"down_(\d+)_attn_(\d+)", r"down_blocks.\1.attentions.\2", k2)
        k2 = _re.sub(r"down_(\d+)_downsample/conv",
                     r"down_blocks.\1.downsamplers.0.conv", k2)
        k2 = _re.sub(r"up_(\d+)_res_(\d+)", r"up_blocks.\1.resnets.\2", k2)
        k2 = _re.sub(r"up_(\d+)_attn_(\d+)", r"up_blocks.\1.attentions.\2", k2)
        k2 = _re.sub(r"up_(\d+)_upsample/conv", r"up_blocks.\1.upsamplers.0.conv", k2)
        k2 = k2.replace("mid_res_0", "mid_block.resnets.0")
        k2 = k2.replace("mid_res_1", "mid_block.resnets.1")
        k2 = k2.replace("mid_attn", "mid_block.attentions.0")
        k2 = _re.sub(r"block_(\d+)", r"transformer_blocks.\1", k2)
        k2 = k2.replace("ff_geglu/proj", "ff.net.0.proj")
        k2 = k2.replace("ff_out", "ff.net.2")
        k2 = _re.sub(r"(attn\d)/to_out", r"\1.to_out.0", k2)
        k2 = k2.replace("/kernel", ".weight").replace("/bias", ".bias")
        k2 = k2.replace("/scale", ".weight")
        k2 = k2.replace("/", ".")
        sd[k2] = np.random.default_rng(0).normal(
            size=torch_shape(k, shape)).astype(np.float32)
        mapping.append((k, k2))

    params = convert_sdxl_unet(
        sd, block_out_channels=cfg.block_out_channels,
        transformer_layers=cfg.transformer_layers)
    assert _tree_shapes(params) == target
    out = model.apply({"params": params}, sample, jnp.array([1.0]), ctx,
                      pooled, tids)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_widen_conv_in():
    """Edit-variant conv_in surgery: new channels zero-init
    (reference: adapter_modules.py:191-198)."""
    from seedx_tpu.utils.sdxl_weights import widen_conv_in

    k = np.ones((3, 3, 4, 32), np.float32)
    out = widen_conv_in(k, 8)
    assert out.shape == (3, 3, 8, 32)
    np.testing.assert_array_equal(out[:, :, :4], 1.0)
    np.testing.assert_array_equal(out[:, :, 4:], 0.0)
    assert widen_conv_in(k, 4) is k


def test_extract_qwen_vit_from_qwen_vl():
    sd = {
        "transformer.visual.conv1.weight": np.zeros((4, 3, 2, 2)),
        "transformer.visual.ln_pre.weight": np.ones(4),
        "transformer.h.0.attn.weight": np.zeros((4, 4)),   # LLM part: dropped
    }
    out = W.extract_qwen_vit_from_qwen_vl(sd)
    assert set(out) == {"conv1.weight", "ln_pre.weight"}
