import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedx_tpu.train.partition import (SEED_X_TRAINABLE_PATTERNS, count_params,
                                       merge_params, path_labels, split_params)
from seedx_tpu.train.schedule import cosine_with_min_lr
from seedx_tpu.train.trainer import (TrainConfig, create_train_state,
                                     make_train_step)


def test_cosine_min_lr_schedule():
    """Matches the reference formula (src/train/schedular.py:18-30)."""
    sched = cosine_with_min_lr(1e-4, warmup_steps=10, total_steps=110,
                               min_lr_ratio=0.05)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(5)), 0.5e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(10)), 1e-4, rtol=1e-5)
    # at the end: lr = min_lr_ratio * lr
    np.testing.assert_allclose(float(sched(110)), 0.05e-4, rtol=1e-4)
    # midway: mean of max and min
    np.testing.assert_allclose(float(sched(60)), 0.525e-4, rtol=1e-4)


def test_param_partition_patterns():
    params = {
        "llm": {
            "model": {"layers": {"layer": {
                "q_proj": {"kernel": np.zeros(1), "lora_a": np.zeros(1),
                           "lora_b": np.zeros(1)},
                "input_layernorm": {"scale": np.zeros(1)},
            }}, "norm": {"scale": np.zeros(1)}},
            "embed_tokens": {"embedding": np.zeros(1)},
            "lm_head": {"kernel": np.zeros(1)},
        },
        "input_resampler": {"query": np.zeros(1)},
        "patch_pos_embed": np.zeros(1),
    }
    labels = path_labels(params)
    flat = jax.tree.leaves_with_path(labels)
    trainable, frozen = split_params(params, labels)
    import flax

    tflat = flax.traverse_util.flatten_dict(trainable, sep="/")
    assert "llm/model/layers/layer/q_proj/lora_a" in tflat
    assert "llm/model/layers/layer/input_layernorm/scale" in tflat
    assert "llm/embed_tokens/embedding" in tflat
    assert "llm/lm_head/kernel" in tflat
    assert "input_resampler/query" in tflat
    assert "patch_pos_embed" in tflat
    fflat = flax.traverse_util.flatten_dict(frozen, sep="/")
    assert "llm/model/layers/layer/q_proj/kernel" in fflat

    merged = merge_params(trainable, frozen)
    assert set(flax.traverse_util.flatten_dict(merged, sep="/")) == set(
        flax.traverse_util.flatten_dict(params, sep="/"))


def test_train_step_decreases_loss(tiny_agent, tiny_agent_cfg):
    model, variables = tiny_agent
    from flax import linen as nn

    params = nn.meta.unbox(variables["params"])
    cfg = TrainConfig(learning_rate=5e-3, warmup_steps=0, max_steps=50,
                      weight_decay=0.0)
    state, frozen = create_train_state(params, cfg)

    # frozen 13B analogue: no optimizer state for frozen leaves
    assert count_params(state.trainable) < count_params(params)

    B, S, N, T = 2, 80, 2, 256
    rng = jax.random.PRNGKey(3)
    ids = jax.random.randint(rng, (B, S), 0, 300)
    batch = dict(
        input_ids=ids,
        attention_mask=jnp.ones((B, S), bool),
        labels=jnp.where(jnp.ones((B, S), bool), ids, -100),
        image_embeds=jax.random.normal(rng, (N, T, tiny_agent_cfg.vit_dim),
                                       jnp.bfloat16),
        embeds_gen_mask=jnp.array([False, True]),
        embeds_cmp_mask=jnp.array([True, False]),
        ids_gen_mask=jnp.zeros((B, S), bool).at[1, 2:66].set(True),
        ids_cmp_mask=jnp.zeros((B, S), bool).at[0, 1:65].set(True),
        patch_positions=jnp.full((N, 2), 0.5),
    )
    train_step = make_train_step(model, cfg)
    losses = []
    step_rng = jax.random.PRNGKey(0)
    for i in range(5):
        state, metrics = train_step(state, frozen, batch,
                                    jax.random.fold_in(step_rng, i))
        losses.append(float(metrics["total_loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 5
