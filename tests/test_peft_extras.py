"""IA3 + prompt-tuning fork-parity tuners (models/peft_extras.py,
models/layers.LoRADense(ia3=...)).

reference: proj/peft/src/peft/tuners/ia3.py (rescaling vectors on
k/v/down_proj) and prompt_tuning.py (virtual-token embeddings) — unused by
any SEED-X flow, carried for PEFT-fork parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from seedx_tpu.models.layers import LoRADense
from seedx_tpu.models.llama import LlamaForCausalLM, llama_debug
from seedx_tpu.models.peft_extras import (IA3_TRAINABLE_PATTERNS,
                                          SoftPrompt, apply_soft_prompt)


def test_ia3_identity_at_init_and_scales_out():
    layer = LoRADense(8, kernel_axes=("embed", "mlp"), ia3="out")
    base = LoRADense(8, kernel_axes=("embed", "mlp"))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 4))
    p = nn.meta.unbox(layer.init(jax.random.PRNGKey(1), x)["params"])
    pb = nn.meta.unbox(base.init(jax.random.PRNGKey(1), x)["params"])
    assert p["ia3_scale"].shape == (8,)
    # ones-init => identical to the base layer
    y = layer.apply({"params": p}, x)
    yb = base.apply({"params": pb}, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yb), rtol=1e-6)
    # scaling vector acts elementwise on the OUTPUT features
    p2 = dict(p)
    p2["ia3_scale"] = p["ia3_scale"] * jnp.arange(8, dtype=jnp.float32)
    y2 = layer.apply({"params": p2}, x)
    np.testing.assert_allclose(np.asarray(y2),
                               np.asarray(y * jnp.arange(8)), rtol=1e-5)


def test_ia3_in_scales_input():
    layer = LoRADense(8, kernel_axes=("mlp", "embed"), ia3="in")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4))
    p = nn.meta.unbox(layer.init(jax.random.PRNGKey(1), x)["params"])
    assert p["ia3_scale"].shape == (4,)
    s = jnp.array([2.0, 1.0, 0.5, 1.0])
    p2 = dict(p)
    p2["ia3_scale"] = s
    y2 = layer.apply({"params": p2}, x)
    yref = layer.apply({"params": p}, x * s)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(yref), rtol=1e-5)


def test_llama_ia3_param_set_and_forward():
    cfg = llama_debug(hidden_size=64, intermediate_size=128, num_layers=2,
                      num_heads=4, num_kv_heads=4)
    import dataclasses

    cfg = dataclasses.replace(cfg, ia3=True)
    model = LlamaForCausalLM(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids,
                           jnp.arange(8)[None], method="init_all")
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    ia3_paths = [jax.tree_util.keystr(p) for p, _ in flat
                 if "ia3_scale" in jax.tree_util.keystr(p)]
    # scanned blocks stack layers: k_proj, v_proj, down_proj => 3 entries
    assert sum("k_proj" in p for p in ia3_paths) == 1
    assert sum("v_proj" in p for p in ia3_paths) == 1
    assert sum("down_proj" in p for p in ia3_paths) == 1
    assert not any("q_proj" in p or "gate_proj" in p for p in ia3_paths)
    embeds = model.apply(variables, ids, method="embed")
    logits = model.apply(variables, embeds, jnp.arange(8)[None])[0]
    assert logits.shape == (1, 8, cfg.padded_vocab_size)

    # the trainable pattern selects exactly the ia3 leaves
    from seedx_tpu.train.partition import path_labels

    labels = path_labels(nn.meta.unbox(variables["params"]),
                         IA3_TRAINABLE_PATTERNS)
    flat_labels = jax.tree_util.tree_leaves_with_path(labels)
    for p, lab in flat_labels:
        is_ia3 = "ia3_scale" in jax.tree_util.keystr(p)
        assert lab == ("trainable" if is_ia3 else "frozen"), p


def test_soft_prompt_prepend_semantics():
    sp = SoftPrompt(num_virtual_tokens=4, hidden_size=16)
    p = sp.init(jax.random.PRNGKey(0), 2)["params"]
    prompt = sp.apply({"params": p}, 2)
    assert prompt.shape == (2, 4, 16)
    np.testing.assert_array_equal(np.asarray(prompt[0]),
                                  np.asarray(prompt[1]))

    embeds = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16))
    mask = jnp.ones((2, 6), bool).at[1, 4:].set(False)
    labels = jnp.arange(12).reshape(2, 6)
    e, m, lab = apply_soft_prompt(prompt, embeds, mask, labels)
    assert e.shape == (2, 10, 16) and m.shape == (2, 10)
    assert lab.shape == (2, 10)
    np.testing.assert_array_equal(np.asarray(lab[:, :4]),
                                  np.full((2, 4), -100))
    np.testing.assert_array_equal(np.asarray(m[:, :4]),
                                  np.ones((2, 4), bool))
    np.testing.assert_array_equal(np.asarray(e[:, 4:]), np.asarray(embeds))
    np.testing.assert_array_equal(np.asarray(m[:, 4:]), np.asarray(mask))


def test_soft_prompt_trains_through_llama():
    """Gradients flow into the prompt embeddings through the backbone's
    inputs_embeds contract; the backbone stays frozen."""
    cfg = llama_debug(hidden_size=32, intermediate_size=64, num_layers=2,
                      num_heads=2, num_kv_heads=2)
    model = LlamaForCausalLM(cfg)
    sp = SoftPrompt(num_virtual_tokens=3, hidden_size=32)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 5), 0, 100)
    pos = jnp.arange(5 + 3)[None]

    lm_params = nn.meta.unbox(model.init(
        jax.random.PRNGKey(1), ids, jnp.arange(5)[None],
        method="init_all")["params"])
    sp_params = nn.meta.unbox(sp.init(jax.random.PRNGKey(2), 2)["params"])

    def loss_fn(sp_params):
        prompt = sp.apply({"params": sp_params}, 2)
        tok = model.apply({"params": lm_params}, ids, method="embed")
        e, _, _ = apply_soft_prompt(prompt, tok)
        logits = model.apply({"params": lm_params}, e, pos)[0]
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    g = jax.grad(loss_fn)(sp_params)
    assert float(jnp.abs(g["embedding"]).sum()) > 0.0
