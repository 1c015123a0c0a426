"""Model factories — the ``_target_``s of the YAML config graph.

These are the TPU-native equivalents of the reference's ``from_pretrained``
classmethods (reference: qwen_visual.py:431-459, peft_models.py:27-106,
seed_x.py:225-234, adapter_modules.py:59-66): build the flax module, init or
convert+load parameters, return ``(module, params)``.

DEBUG mode: set env ``SEEDX_DEBUG=1`` (the reference's ``DEBUG_FLAG``) to get
tiny random models regardless of config — every entry point then runs
without the released 17B weights.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def _debug_mode() -> bool:
    return os.environ.get("SEEDX_DEBUG", os.environ.get("DEBUG_FLAG", "")) \
        in ("1", "True", "true")


def _merge_loaded(init_params: Any, loaded: Any, label: str) -> Any:
    """Overlay converted weights onto an init tree, reporting mismatches
    (the reference prints missing/unexpected keys, adapter_modules.py:64-65).
    """
    from flax import traverse_util

    flat_init = traverse_util.flatten_dict(init_params, sep="/")
    flat_load = traverse_util.flatten_dict(loaded, sep="/")
    missing = [k for k in flat_init if k not in flat_load]
    unexpected = [k for k in flat_load if k not in flat_init]
    merged = {}
    skipped = []
    for k, v in flat_init.items():
        if k in flat_load:
            w = jnp.asarray(flat_load[k], dtype=v.dtype if hasattr(v, "dtype")
                            else None)
            if hasattr(v, "shape") and w.shape != v.shape:
                skipped.append((k, w.shape, v.shape))
                merged[k] = v
            else:
                merged[k] = w
        else:
            merged[k] = v
    if missing or unexpected or skipped:
        logger.info("%s load: %d missing, %d unexpected, %d shape-mismatched",
                    label, len(missing), len(unexpected), len(skipped))
    return traverse_util.unflatten_dict(merged, sep="/")


def _validate_sd(sd, manifest_name: str, strict: bool,
                 extra_optional=()) -> None:
    """Check a loaded torch state dict against the pinned release manifest
    (utils/manifest.py): log the diff; raise when ``strict`` (the golden
    readiness harness) so a wrong artifact fails before conversion."""
    from seedx_tpu.utils.manifest import validate_state_dict

    rep = validate_state_dict(sd, manifest_name,
                              extra_optional=extra_optional)
    if rep.ok:
        logger.info(rep.summary())
    elif strict:
        raise ValueError(rep.summary())
    else:
        logger.warning(rep.summary())


def build_visual_encoder(
    pretrained_model_path: Optional[str] = None,
    image_size: int = 448,
    patch_size: int = 14,
    width: int = 1664,
    layers: int = 48,
    heads: int = 16,
    mlp_ratio: float = 4.9231,
    output_dim: int = 4096,
    remat: bool = True,
    param_dtype: str = "float32",
    validate: bool = False,
    **unused,
) -> Tuple[Any, Any]:
    """(reference: VisionTransformerWithAttnPool.from_pretrained,
    qwen_visual.py:431-459)"""
    from seedx_tpu.models.vit import ViTConfig, VisionTransformer, vit_tiny_debug

    if _debug_mode():
        cfg = vit_tiny_debug(image_size=image_size)
        pretrained_model_path = None
    else:
        cfg = ViTConfig(image_size=image_size, patch_size=patch_size,
                        width=width, layers=layers, heads=heads,
                        mlp_ratio=mlp_ratio, output_dim=output_dim,
                        param_dtype=jnp.dtype(param_dtype))
    model = VisionTransformer(cfg, remat=remat)
    dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), dummy))["params"] \
        if pretrained_model_path else \
        model.init(jax.random.PRNGKey(0), dummy)["params"]

    if pretrained_model_path:
        from flax import linen as nn

        from seedx_tpu.utils.weights import (convert_qwen_vit,
                                             load_checkpoint_auto)

        sd = load_checkpoint_auto(pretrained_model_path)
        _validate_sd(sd, "qwen_vit", strict=validate)
        loaded = convert_qwen_vit(sd, num_layers=cfg.layers)
        shapes = nn.meta.unbox(params)
        params = _merge_loaded(
            jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype), shapes),
            loaded, "qwen_vit")
    else:
        from flax import linen as nn

        params = nn.meta.unbox(params)
    return model, params


def build_llm_config(
    vocab_size: int = 32330,
    lora_rank: int = 0,
    lora_alpha: float = 32.0,
    lora_dropout: float = 0.05,
    **overrides,
):
    """(reference: llm_seed_x_lora.yaml / get_peft_model_with_resize_embedding)"""
    from seedx_tpu.models.llama import llama2_13b, llama_debug

    if _debug_mode():
        return llama_debug(lora_rank=lora_rank, lora_alpha=lora_alpha,
                           lora_dropout=lora_dropout)
    return llama2_13b(vocab_size=vocab_size, lora_rank=lora_rank,
                      lora_alpha=lora_alpha, lora_dropout=lora_dropout,
                      **overrides)


def agent_init_fn(model):
    """Zero-arg init closure for a ContinuousLVLM with the canonical dummy
    ceremony (one image slot, one forced image span).  Used for real init,
    for abstract shape derivation, and — via ``jax.eval_shape`` — to recover
    the boxed logical-axis annotations needed to shard loaded parameters."""
    cfg = model.cfg
    B, S, N = 1, 80, 1
    t = 4 * cfg.num_img_out_tokens if cfg.vit_down else cfg.num_img_out_tokens
    ids = jnp.zeros((B, S), jnp.int32)
    attn = jnp.ones((B, S), bool)
    img = jnp.zeros((N, t, cfg.vit_dim), jnp.bfloat16)
    fmask = jnp.zeros((N,), bool)
    idsm = jnp.zeros((B, S), bool).at[0, 1:1 + cfg.num_img_out_tokens].set(True)
    return lambda: model.init(
        jax.random.PRNGKey(0), ids, attn, jnp.where(attn, ids, -100), img,
        fmask, fmask, idsm, idsm, jnp.full((N, 2), 0.5), method="init_all")


def abstract_params(model, *init_args, method=None) -> Any:
    """Boxed abstract param tree (ShapeDtypeStructs + logical axis metadata)
    for any flax module — the sharding-spec source for loaded checkpoints."""
    kw = {"method": method} if method else {}
    return jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), *init_args, **kw))["params"]


def build_agent(
    llm: Any,
    pretrained_llm_path: Optional[str] = None,
    pretrained_agent_path: Optional[str] = None,
    lm_loss_scale: float = 1.0,
    rec_loss_scale: float = 6.0,
    add_patch_pos: bool = True,
    vit_down: bool = True,
    vit_dim: int = 4096,
    num_img_in_tokens: int = 64,
    num_img_out_tokens: int = 64,
    validate: bool = False,
    **unused,
) -> Tuple[Any, Any]:
    """(reference: ContinuousLVLM.from_pretrained, seed_x.py:225-234 +
    agent_seed_x.yaml)"""
    from seedx_tpu.models.agent import AgentConfig, ContinuousLVLM

    if _debug_mode():
        # must match vit_tiny_debug's output_dim (128)
        vit_dim = 128 if vit_dim == 4096 else vit_dim

    cfg = AgentConfig(
        llm=llm, lm_loss_scale=lm_loss_scale, rec_loss_scale=rec_loss_scale,
        add_patch_pos=add_patch_pos, vit_down=vit_down, vit_dim=vit_dim,
        num_img_in_tokens=num_img_in_tokens,
        num_img_out_tokens=num_img_out_tokens,
        resampler_heads=32 if not _debug_mode() else 4)
    model = ContinuousLVLM(cfg)
    init_fn = agent_init_fn(model)

    from flax import linen as nn

    if pretrained_llm_path or pretrained_agent_path:
        shapes = nn.meta.unbox(jax.eval_shape(init_fn)["params"])
        params = jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype), shapes)
        from seedx_tpu.utils.weights import (convert_agent_checkpoint,
                                             convert_llama_hf,
                                             load_checkpoint_auto)

        if pretrained_llm_path:
            sd = load_checkpoint_auto(pretrained_llm_path)
            _validate_sd(sd, "llm", strict=validate)
            llm_params = convert_llama_hf(sd, num_layers=llm.num_layers,
                                          vocab_size=llm.vocab_size,
                                          pad_to=llm.padded_vocab_size)
            params = _merge_loaded(params, {"llm": llm_params}, "llm")
        if pretrained_agent_path:
            sd = load_checkpoint_auto(pretrained_agent_path)
            _validate_sd(sd, "agent", strict=validate)
            agent_parts = convert_agent_checkpoint(sd)
            llm_sd = agent_parts.pop("llm_state_dict", None)
            params = _merge_loaded(params, agent_parts, "agent")
            if llm_sd:
                llm_params = convert_llama_hf(llm_sd,
                                              num_layers=llm.num_layers,
                                              vocab_size=llm.vocab_size,
                                              pad_to=llm.padded_vocab_size)
                params = _merge_loaded(params, {"llm": llm_params},
                                       "agent-llm")
    else:
        params = nn.meta.unbox(init_fn()["params"])
    return model, params


def build_sdxl_adapter(
    resampler: Any = None,
    detokenizer_path: Optional[str] = None,   # pretrained/seed_detokenizer/*
    sdxl_unet_path: Optional[str] = None,     # SDXL base unet safetensors
    sdxl_vae_path: Optional[str] = None,
    with_latent_image: bool = False,          # SEED-X-Edit variant
    vit_down: bool = True,
    visual_encoder: Any = None,
    visual_encoder_params: Any = None,
    validate: bool = False,
    **unused,                                 # full_ft etc. are train-time
) -> Any:
    """Config-graph target mirroring the reference's
    ``SDXLAdapter[WithLatentImage].from_pretrained``
    (reference: src/models/detokenizer/adapter_modules.py:11,172 +
    configs/sdxl_adapter/*.yaml).  ``full_ft``/``set_trainable_late`` are
    training-time trainable-set switches in the reference; here the
    trainable set is an optax mask (ADAPTER_TRAINABLE_PATTERNS), so those
    keys are accepted and ignored.

    Returns a ``SDXLAdapter`` bundling UNet + resampler (+ VAE when paths
    are given).
    """
    from seedx_tpu.models.adapter import AdapterConfig, SDXLAdapter
    from seedx_tpu.models.detokenizer import DetokenizerConfig
    from seedx_tpu.models.sdxl.unet import sdxl_base_unet, sdxl_edit_unet
    from seedx_tpu.models.sdxl.vae import VAEConfig
    from seedx_tpu.utils.sdxl_weights import (convert_sdxl_unet,
                                              convert_sdxl_unet_deltas,
                                              convert_sdxl_vae)
    from seedx_tpu.utils.weights import (convert_detokenizer_resampler,
                                         load_checkpoint_auto)

    if resampler is None:
        rcfg = DetokenizerConfig()
    elif isinstance(resampler, DetokenizerConfig):
        rcfg = resampler
    else:                                     # plain dict from YAML
        rcfg = DetokenizerConfig(**{k: v for k, v in dict(resampler).items()
                                    if k != "_target_"})

    ucfg = sdxl_edit_unet() if with_latent_image else sdxl_base_unet()
    unet_params = resampler_params = None
    dec_params = enc_params = None
    if sdxl_unet_path:
        sd = load_checkpoint_auto(sdxl_unet_path)
        _validate_sd(sd, "sdxl_unet", strict=validate)
        unet_params = convert_sdxl_unet(
            sd, widen_conv_in_to=8 if with_latent_image else None)
    if sdxl_vae_path:
        sd = load_checkpoint_auto(sdxl_vae_path)
        _validate_sd(sd, "sdxl_vae", strict=validate)
        vae = convert_sdxl_vae(sd)
        enc_params, dec_params = vae["encoder"], vae["decoder"]
    if detokenizer_path:
        sd = load_checkpoint_auto(detokenizer_path)
        _validate_sd(sd, "detokenizer", strict=validate,
                     extra_optional=("unet.*",))
        resampler_params = convert_detokenizer_resampler(sd)
        # detokenizer ckpts may carry UNet weights: either the FULL
        # fine-tuned UNet (Edit variant, full_ft=True — conv_in already
        # 8-channel) or just the trainable cross-attn to_k/to_v deltas
        # (reference adapter_modules.py:21-33, loaded strict=False :62-65)
        unet_sd = {k[len("unet."):]: v for k, v in sd.items()
                   if k.startswith("unet.")}
        if unet_sd and unet_params is not None:
            from flax import traverse_util

            if any(k.startswith("conv_in") for k in unet_sd):
                deltas = convert_sdxl_unet(unet_sd, widen_conv_in_to=None)
            else:
                parted = convert_sdxl_unet_deltas(unet_sd)
                deltas = parted["deltas"]
                if parted["skipped"]:
                    logger.warning(
                        "detokenizer UNet deltas: %d keys not "
                        "attention linears, dropped: %s ...",
                        len(parted["skipped"]), parted["skipped"][:5])
            if deltas:
                flat = traverse_util.flatten_dict(unet_params, sep="/")
                delta_flat = traverse_util.flatten_dict(deltas, sep="/")
                stray = [k for k in delta_flat if k not in flat]
                if stray:
                    logger.warning("detokenizer UNet deltas: %d keys not in "
                                   "the UNet tree, dropped: %s ...",
                                   len(stray), stray[:5])
                flat.update({k: v for k, v in delta_flat.items()
                             if k in flat})
                unet_params = traverse_util.unflatten_dict(flat, sep="/")

    acfg = AdapterConfig(unet=ucfg, resampler=rcfg, vit_down=vit_down,
                         with_latent_image=with_latent_image)
    return SDXLAdapter(acfg, unet_params, resampler_params, dec_params,
                       enc_params, visual_encoder=visual_encoder,
                       visual_encoder_params=visual_encoder_params,
                       vae_cfg=VAEConfig())
