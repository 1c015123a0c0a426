"""Release-artifact readiness: converter manifests, HF-dir checkpoint
loading, partial UNet deltas, and the from_pretrained layout mapping.

These pin the pieces that must work FIRST TRY the day the released 17B
checkpoints are on disk (reference README.md:74-158): the manifests were
generated from the reference torch modules at full geometry on the meta
device (scripts/gen_manifests.py), so `validate_state_dict` failing == the
artifact doesn't match what the converters were built for.
"""

import json
import os
import types

import numpy as np
import pytest

from seedx_tpu.utils.manifest import (MANIFEST_NAMES, load_manifest,
                                      validate_or_raise, validate_state_dict)


def _shape_only(shape):
    return types.SimpleNamespace(shape=tuple(shape))


def _sd_from_manifest(name):
    m = load_manifest(name)
    return {k: _shape_only(v) for k, v in m["keys"].items()}


def test_manifests_present_and_wellformed():
    for name in MANIFEST_NAMES:
        m = load_manifest(name)
        assert m["keys"], name
        for k, shape in m["keys"].items():
            assert isinstance(shape, list) and all(
                isinstance(d, int) for d in shape), (name, k)
        # optional/ignored don't overlap required keys
        assert not set(m["optional"]) & set(m["keys"]), name


def test_manifest_geometry_spotchecks():
    """Pin a few release-geometry facts through the manifests themselves
    (reference geometry: 13B llama vocab 32330, ViT-bigG width 1664,
    SDXL UNet conv_in 4ch / detok resampler 64 queries)."""
    llm = load_manifest("llm")["keys"]
    assert llm["model.embed_tokens.weight"] == [32330, 5120]
    assert llm["lm_head.weight"] == [32330, 5120]
    assert sum(".layers.39." in k for k in llm) > 0      # 40 layers

    vit = load_manifest("qwen_vit")["keys"]
    assert vit["transformer.resblocks.47.attn.in_proj.weight"] == [4992, 1664]

    agent = load_manifest("agent")["keys"]
    assert any("lora_A" in k for k in agent)             # LoRA-wrapped llm
    assert agent["output_resampler.query"] == [64, 4096]
    assert agent["input_resampler.query"] == [64, 5120]

    unet = load_manifest("sdxl_unet")["keys"]
    assert unet["conv_in.weight"] == [320, 4, 3, 3]      # base = 4 channels

    detok = load_manifest("detokenizer")["keys"]
    assert detok["resampler.latents"] == [1, 64, 1024]
    # the trainable UNet cross-attn deltas are OPTIONAL in the stage ckpt
    opt = load_manifest("detokenizer")["optional"]
    assert any(".attn2.to_k." in k for k in opt)


def test_validate_state_dict_clean():
    for name in ("sdxl_vae", "detokenizer"):
        rep = validate_state_dict(_sd_from_manifest(name), name)
        assert rep.ok, rep.summary()


def test_validate_state_dict_detects_problems():
    name = "sdxl_vae"
    sd = _sd_from_manifest(name)
    victim = next(iter(sd))
    good = dict(sd)

    del sd[victim]
    rep = validate_state_dict(sd, name)
    assert rep.missing == [victim] and not rep.ok

    sd = dict(good)
    sd["totally.new.key"] = _shape_only((1,))
    rep = validate_state_dict(sd, name)
    assert rep.unexpected == ["totally.new.key"]

    sd = dict(good)
    sd[victim] = _shape_only((9, 9, 9))
    rep = validate_state_dict(sd, name)
    assert rep.mismatched and rep.mismatched[0][0] == victim

    with pytest.raises(ValueError, match="MANIFEST MISMATCH"):
        validate_or_raise(sd, name)


def test_validate_optional_and_extra_optional_tolerated():
    name = "detokenizer"
    sd = _sd_from_manifest(name)
    m = load_manifest(name)
    # present optional keys are fine
    for k in m["optional"][:3]:
        sd[k] = _shape_only((1,))
    # glob-pattern extras (e.g. optimizer state in a stage ckpt)
    sd["optimizer.state.step"] = _shape_only(())
    rep = validate_state_dict(sd, name, extra_optional=("optimizer.*",))
    assert rep.ok, rep.summary()


# ---------------------------------------------------------------------------
# HF-layout directory loading (the llm artifact ships as an indexed shard
# dir; SDXL unet/vae as diffusers single-file dirs)
# ---------------------------------------------------------------------------

def test_load_checkpoint_auto_sharded_dir(tmp_path):
    import torch

    from seedx_tpu.utils.weights import load_checkpoint_auto

    d = tmp_path / "llm"
    d.mkdir()
    torch.save({"a.weight": torch.ones(2, 3)},
               d / "pytorch_model-00001-of-00002.bin")
    torch.save({"b.weight": torch.zeros(4)},
               d / "pytorch_model-00002-of-00002.bin")
    (d / "pytorch_model.bin.index.json").write_text(json.dumps({
        "metadata": {"total_size": 0},
        "weight_map": {"a.weight": "pytorch_model-00001-of-00002.bin",
                       "b.weight": "pytorch_model-00002-of-00002.bin"}}))
    sd = load_checkpoint_auto(str(d))
    assert set(sd) == {"a.weight", "b.weight"}
    assert sd["a.weight"].shape == (2, 3)
    np.testing.assert_array_equal(sd["a.weight"], np.ones((2, 3)))


def test_load_checkpoint_auto_single_file_dir(tmp_path):
    import torch

    from seedx_tpu.utils.weights import load_checkpoint_auto

    d = tmp_path / "unet"
    d.mkdir()
    torch.save({"conv.weight": torch.ones(1, 2)},
               d / "diffusion_pytorch_model.bin")
    sd = load_checkpoint_auto(str(d))
    assert set(sd) == {"conv.weight"}

    with pytest.raises(FileNotFoundError, match="no weight files"):
        load_checkpoint_auto(str(tmp_path / "unet2")) \
            if (tmp_path / "unet2").mkdir() is None else None


# ---------------------------------------------------------------------------
# Partial UNet deltas (detokenizer stage checkpoints carry the trainable
# cross-attn to_k/to_v; reference loads them strict=False)
# ---------------------------------------------------------------------------

def test_convert_sdxl_unet_deltas_mapping():
    from seedx_tpu.utils.sdxl_weights import convert_sdxl_unet_deltas

    w = np.arange(6, dtype=np.float32).reshape(2, 3)
    sd = {
        "down_blocks.1.attentions.0.transformer_blocks.1.attn2.to_k.weight": w,
        "mid_block.attentions.0.transformer_blocks.9.attn2.to_v.weight": w,
        "up_blocks.0.attentions.2.transformer_blocks.0.attn1.to_out.0.bias":
            np.ones(2, np.float32),
        "conv_in.weight": np.zeros((1, 1, 1, 1), np.float32),  # not an attn
    }
    parted = convert_sdxl_unet_deltas(sd)
    d = parted["deltas"]
    np.testing.assert_array_equal(
        d["down_1_attn_0"]["block_1"]["attn2"]["to_k"]["kernel"], w.T)
    np.testing.assert_array_equal(
        d["mid_attn"]["block_9"]["attn2"]["to_v"]["kernel"], w.T)
    np.testing.assert_array_equal(
        d["up_0_attn_2"]["block_0"]["attn1"]["to_out"]["bias"], np.ones(2))
    assert parted["skipped"] == ["conv_in.weight"]


def test_detokenizer_optional_keys_all_mappable():
    """Every optional unet.* key the manifest lists must map onto a flax
    path — otherwise a real stage checkpoint's deltas would be dropped."""
    from seedx_tpu.utils.sdxl_weights import _map_attn_key

    opt = load_manifest("detokenizer")["optional"]
    unet_keys = [k[len("unet."):] for k in opt if k.startswith("unet.")]
    assert unet_keys
    unmapped = [k for k in unet_keys if _map_attn_key(k) is None]
    assert not unmapped, unmapped


def test_unet_delta_paths_exist_in_flax_tree():
    """The delta paths must land inside the REAL UNet param tree (full
    SDXL geometry, shape-only via eval_shape — no weights materialised)."""
    import jax
    import jax.numpy as jnp

    from seedx_tpu.models.sdxl.unet import UNet2DCondition, sdxl_base_unet
    from seedx_tpu.utils.sdxl_weights import _map_attn_key

    ucfg = sdxl_base_unet()
    unet = UNet2DCondition(ucfg)
    abs_params = jax.eval_shape(
        lambda: unet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 128, 128, ucfg.in_channels)), jnp.array([1.0]),
            jnp.zeros((1, 8, ucfg.cross_attention_dim)),
            jnp.zeros((1, 1280)), jnp.zeros((1, 6))))["params"]
    from flax import traverse_util
    flat = traverse_util.flatten_dict(abs_params)

    opt = load_manifest("detokenizer")["optional"]
    unet_keys = [k[len("unet."):] for k in opt if k.startswith("unet.")]
    missing = []
    for k in unet_keys:
        path = _map_attn_key(k)
        if path not in flat:
            missing.append((k, path))
    assert not missing, missing[:5]


# ---------------------------------------------------------------------------
# from_pretrained layout mapping
# ---------------------------------------------------------------------------

def test_from_pretrained_reports_missing_artifacts(tmp_path):
    from seedx_tpu.inference.runtime import SeedXRuntime

    with pytest.raises(FileNotFoundError) as ei:
        SeedXRuntime.from_pretrained(root=str(tmp_path), model="seed_x_i")
    msg = str(ei.value)
    assert "QwenViT/qwen_vit_G.pt" in msg
    assert os.path.join("seed_x_i", "llm") in msg
    assert "stable-diffusion-xl-base-1.0" in msg

    with pytest.raises(ValueError, match="model must be one of"):
        SeedXRuntime.from_pretrained(root=str(tmp_path), model="nope")


def test_from_pretrained_edit_selects_second_stage(tmp_path):
    from seedx_tpu.inference.runtime import SeedXRuntime

    with pytest.raises(FileNotFoundError) as ei:
        SeedXRuntime.from_pretrained(root=str(tmp_path), model="seed_x_edit")
    assert "second_stage" in str(ei.value)
