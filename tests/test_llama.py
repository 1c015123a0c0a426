import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedx_tpu.models.llama import (LlamaForCausalLM, causal_lm_loss,
                                    init_kv_cache, llama_debug)


@pytest.fixture(scope="module")
def llm():
    cfg = llama_debug(hidden_size=128, intermediate_size=256, num_layers=2,
                      num_heads=4, num_kv_heads=4)
    model = LlamaForCausalLM(cfg)
    B, S = 2, 16
    ids = jax.random.randint(jax.random.PRNGKey(0), (B, S), 0, cfg.vocab_size)
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    variables = model.init(jax.random.PRNGKey(0), ids, positions,
                           method="init_all")
    return cfg, model, variables, ids, positions


def test_forward_shapes(llm):
    cfg, model, variables, ids, positions = llm
    embeds = model.apply(variables, ids, method="embed")
    logits, hidden, _ = model.apply(variables, embeds, positions,
                                    jnp.ones(ids.shape, bool))
    assert logits.shape == (*ids.shape, cfg.vocab_size)
    assert hidden.shape == (*ids.shape, cfg.hidden_size)


def test_loss_ignores_masked_labels(llm):
    cfg, model, variables, ids, positions = llm
    embeds = model.apply(variables, ids, method="embed")
    logits, _, _ = model.apply(variables, embeds, positions,
                               jnp.ones(ids.shape, bool))
    labels_all = ids
    labels_none = jnp.full_like(ids, -100)
    loss_all = causal_lm_loss(logits, labels_all)
    loss_none = causal_lm_loss(logits, labels_none)
    assert float(loss_all) > 0
    assert float(loss_none) == 0.0


def test_prefill_matches_no_cache(llm):
    cfg, model, variables, ids, positions = llm
    B, S = ids.shape
    embeds = model.apply(variables, ids, method="embed")
    logits, _, _ = model.apply(variables, embeds, positions,
                               jnp.ones((B, S), bool))
    cache = init_kv_cache(cfg, B, 32)
    kv_valid = jnp.arange(32)[None, :] < S
    logits2, _, cache2 = model.apply(variables, embeds, positions, kv_valid,
                                     cache, 0)
    np.testing.assert_allclose(np.asarray(logits, np.float32),
                               np.asarray(logits2, np.float32), atol=1e-2)


def test_incremental_decode_matches_full_forward(llm):
    """Token-by-token decode with KV cache must reproduce the full forward."""
    cfg, model, variables, ids, positions = llm
    B, S = ids.shape
    embeds = model.apply(variables, ids, method="embed")
    full_logits, _, _ = model.apply(variables, embeds, positions,
                                    jnp.ones((B, S), bool))

    cache = init_kv_cache(cfg, B, S)
    step_logits = []
    for t in range(S):
        kv_valid = jnp.arange(S)[None, :] <= t
        lg, _, cache = model.apply(variables, embeds[:, t:t + 1],
                                   positions[:, t:t + 1], kv_valid, cache, t)
        step_logits.append(lg[:, 0])
    step_logits = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(np.asarray(full_logits, np.float32),
                               np.asarray(step_logits, np.float32), atol=2e-2)


def test_lora_zero_init_preserves_forward(llm):
    cfg, model, variables, ids, positions = llm
    lora_cfg = llama_debug(hidden_size=128, intermediate_size=256,
                           num_layers=2, num_heads=4, num_kv_heads=4,
                           lora_rank=4)
    lora_model = LlamaForCausalLM(lora_cfg)
    lora_vars = lora_model.init(jax.random.PRNGKey(0), ids, positions,
                                method="init_all")
    # copy base params from the non-LoRA model (same init seed -> same values
    # for shared leaves; here we overwrite to be safe)
    import flax

    base = flax.traverse_util.flatten_dict(variables["params"], sep="/")
    lora = flax.traverse_util.flatten_dict(lora_vars["params"], sep="/")
    for k, v in base.items():
        assert k in lora, k
        lora[k] = v
    merged = {"params": flax.traverse_util.unflatten_dict(lora, sep="/")}

    embeds = model.apply(variables, ids, method="embed")
    ref_logits, _, _ = model.apply(variables, embeds, positions,
                                   jnp.ones(ids.shape, bool))
    lora_logits, _, _ = lora_model.apply(merged, embeds, positions,
                                         jnp.ones(ids.shape, bool))
    # lora_b is zero-init -> identical output
    np.testing.assert_allclose(np.asarray(ref_logits, np.float32),
                               np.asarray(lora_logits, np.float32), atol=1e-5)


def test_sequence_classification_head():
    from seedx_tpu.models.llama import LlamaForSequenceClassification

    cfg = llama_debug(hidden_size=64, intermediate_size=128, num_layers=1,
                      num_heads=2, num_kv_heads=2)
    model = LlamaForSequenceClassification(cfg, num_labels=3)
    B, S = 2, 10
    ids = jax.random.randint(jax.random.PRNGKey(0), (B, S), 0, 100)
    mask = jnp.asarray(np.array([[1] * 10, [1] * 6 + [0] * 4]), bool)
    variables = model.init(jax.random.PRNGKey(0), ids, mask)
    out = model.apply(variables, ids, mask)
    assert out.shape == (B, 3)
    # padding beyond the last valid token must not change the score
    ids2 = ids.at[1, 6:].set(7)
    out2 = model.apply(variables, ids2, mask)
    np.testing.assert_allclose(np.asarray(out[1], np.float32),
                               np.asarray(out2[1], np.float32), atol=1e-5)


def test_vocab_padding_is_inert():
    """vocab_pad_to (TP-divisibility padding): padded model == unpadded
    model on the real vocab columns; pad columns are masked to -1e9."""
    import dataclasses

    from flax import traverse_util

    kw = dict(hidden_size=128, intermediate_size=256, num_layers=2,
              num_heads=4, num_kv_heads=4)
    cfg_pad = llama_debug(vocab_pad_to=32336, **kw)
    assert cfg_pad.padded_vocab_size == 32336
    model_pad = LlamaForCausalLM(cfg_pad)
    B, S = 2, 12
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0,
                             cfg_pad.vocab_size)
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    vars_pad = model_pad.init(jax.random.PRNGKey(0), ids, positions,
                              method="init_all")

    # slice the padded params down to the exact-vocab model
    from flax import linen as nn

    vars_pad = {"params": nn.meta.unbox(vars_pad["params"])}
    flat = traverse_util.flatten_dict(vars_pad["params"], sep="/")
    v = cfg_pad.vocab_size
    flat["embed_tokens/embedding"] = flat["embed_tokens/embedding"][:v]
    flat["lm_head/kernel"] = flat["lm_head/kernel"][:, :v]
    vars_exact = {"params": traverse_util.unflatten_dict(flat, sep="/")}
    model_exact = LlamaForCausalLM(llama_debug(**kw))

    emb_pad = model_pad.apply(vars_pad, ids, method="embed")
    emb_exact = model_exact.apply(vars_exact, ids, method="embed")
    np.testing.assert_array_equal(np.asarray(emb_pad), np.asarray(emb_exact))

    lg_pad, hid_pad, _ = model_pad.apply(vars_pad, emb_pad, positions)
    lg_exact, hid_exact, _ = model_exact.apply(vars_exact, emb_exact,
                                               positions)
    assert lg_pad.shape[-1] == 32336
    np.testing.assert_array_equal(np.asarray(lg_pad[..., :v], np.float32),
                                  np.asarray(lg_exact, np.float32))
    assert float(jnp.max(lg_pad[..., v:])) <= -1e8   # masked
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(lg_pad, -1)), np.asarray(jnp.argmax(lg_exact, -1)))
