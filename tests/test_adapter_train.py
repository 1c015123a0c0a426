import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from seedx_tpu.models.detokenizer import DetokenizerConfig, ResamplerXL
from seedx_tpu.models.sdxl.pipeline import default_time_ids, SamplerConfig
from seedx_tpu.models.sdxl.unet import UNet2DCondition, sdxl_debug_unet
from seedx_tpu.train.train_adapter import (AdapterTrainConfig,
                                           make_adapter_train_step,
                                           make_sigma_tables)


def test_sigma_tables_monotone():
    s = make_sigma_tables()
    assert s.shape == (1000,)
    assert float(s[0]) < float(s[-1])       # noise grows with t


def test_adapter_train_step_decreases_loss():
    ucfg = sdxl_debug_unet()
    rcfg = DetokenizerConfig(
        dim=64, depth=1, dim_head=16, heads=4, num_queries=8,
        embedding_dim=32,
        output2_dim=ucfg.projection_class_embeddings_input_dim
        - 6 * ucfg.addition_time_embed_dim,
        output1_dim=0, ff_mult=2)
    import dataclasses

    rcfg = dataclasses.replace(
        rcfg, output1_dim=ucfg.cross_attention_dim - rcfg.output2_dim)
    unet = UNet2DCondition(ucfg)
    resampler = ResamplerXL(rcfg)

    B, hw, T = 2, 8, 4
    rng = jax.random.PRNGKey(0)
    latents = jax.random.normal(rng, (B, hw, hw, 4))
    image_embeds = jax.random.normal(rng, (B, T, rcfg.embedding_dim))

    res_params = nn.meta.unbox(resampler.init(rng, image_embeds)["params"])
    prompt, pooled = resampler.apply({"params": res_params}, image_embeds)
    unet_params = nn.meta.unbox(unet.init(
        rng, latents, jnp.array([1.0]), prompt, pooled,
        jnp.zeros((B, 6)))["params"])

    cfg = AdapterTrainConfig(learning_rate=1e-3, warmup_steps=0, max_steps=50)
    tids = default_time_ids(SamplerConfig(height=hw * 8, width=hw * 8), 1)[0]
    init_state, train_step = make_adapter_train_step(unet, resampler, cfg,
                                                     tids)
    state, frozen = init_state(unet_params, res_params)

    # trainable = resampler + to_k/to_v (+conv_in), NOT full unet
    import flax.traverse_util as tu

    tkeys = set(tu.flatten_dict(state["trainable"], sep="/"))
    assert any(k.startswith("resampler/") for k in tkeys)
    assert any("to_k" in k for k in tkeys)
    assert not any("ff_out" in k for k in tkeys)

    batch = {"latents": latents, "image_embeds": image_embeds}
    losses = []
    for i in range(8):
        state, metrics = train_step(state, frozen, batch,
                                    jax.random.fold_in(jax.random.PRNGKey(1),
                                                       i % 2))
        losses.append(float(metrics["total_loss"]))
        assert np.isfinite(losses[-1])
    # noise targets vary per step; compare same-rng pairs
    assert losses[-1] < losses[0] or losses[-2] < losses[1]
    assert int(state["step"]) == 8
