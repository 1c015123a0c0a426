import jax
import jax.numpy as jnp
import numpy as np

from seedx_tpu.models.llama import LlamaForCausalLM, llama_debug
from seedx_tpu.utils.quantize import quantize_kernel, quantize_llama_params


def test_quantize_kernel_roundtrip():
    rng = np.random.default_rng(0)
    k = rng.normal(size=(64, 32)).astype(np.float32)
    q, scale = quantize_kernel(k)
    assert q.dtype == np.int8 and scale.shape == (32,)
    rec = q.astype(np.float32) * scale[None, :]
    # absmax symmetric: error bounded by scale/2 per element
    assert np.max(np.abs(rec - k)) <= np.max(scale) * 0.5 + 1e-6


def test_int8_llama_matches_fp():
    """Quantized 13B-layout forward ~= full-precision forward."""
    cfg = llama_debug(hidden_size=128, intermediate_size=256, num_layers=2,
                      num_heads=4, num_kv_heads=4)
    qcfg = llama_debug(hidden_size=128, intermediate_size=256, num_layers=2,
                       num_heads=4, num_kv_heads=4, quantization="int8")
    model = LlamaForCausalLM(cfg)
    qmodel = LlamaForCausalLM(qcfg)

    B, S = 1, 16
    ids = jax.random.randint(jax.random.PRNGKey(0), (B, S), 0, cfg.vocab_size)
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    from flax import linen as nn

    params = nn.meta.unbox(model.init(jax.random.PRNGKey(0), ids, positions,
                                      method="init_all")["params"])
    qparams = jax.tree.map(jnp.asarray, quantize_llama_params(
        jax.tree.map(np.asarray, params)))

    embeds = model.apply({"params": params}, ids, method="embed")
    ref, _, _ = model.apply({"params": params}, embeds, positions,
                            jnp.ones((B, S), bool))
    out, _, _ = qmodel.apply({"params": qparams}, embeds, positions,
                             jnp.ones((B, S), bool))
    ref = np.asarray(ref, np.float32)
    out = np.asarray(out, np.float32)
    # int8 weight-only: logits agree closely; argmax agrees
    assert np.mean(np.abs(ref - out)) < 0.1
    agree = (ref.argmax(-1) == out.argmax(-1)).mean()
    assert agree > 0.9


def test_merge_lora_equals_lora_forward():
    """Merged kernels (lora_rank=0 model) == LoRA model forward."""
    from seedx_tpu.utils.export import merge_lora

    lcfg = llama_debug(hidden_size=64, intermediate_size=128, num_layers=2,
                       num_heads=2, num_kv_heads=2, lora_rank=4,
                       lora_alpha=8.0)
    base_cfg = llama_debug(hidden_size=64, intermediate_size=128,
                           num_layers=2, num_heads=2, num_kv_heads=2)
    lmodel = LlamaForCausalLM(lcfg)
    bmodel = LlamaForCausalLM(base_cfg)

    B, S = 1, 12
    ids = jax.random.randint(jax.random.PRNGKey(0), (B, S), 0, 100)
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    from flax import linen as nn

    params = nn.meta.unbox(lmodel.init(jax.random.PRNGKey(0), ids, pos,
                                       method="init_all")["params"])
    # non-trivial lora_b (zero-init by default)
    import flax.traverse_util as tu

    flat = tu.flatten_dict(params, sep="/")
    for k in flat:
        if k.endswith("lora_b"):
            flat[k] = jax.random.normal(jax.random.PRNGKey(hash(k) % 100),
                                        flat[k].shape, flat[k].dtype) * 0.1
    params = tu.unflatten_dict(flat, sep="/")

    merged = merge_lora(params, alpha=8.0)
    assert not any(k.endswith("lora_a") for k in
                   tu.flatten_dict(merged, sep="/"))

    embeds = lmodel.apply({"params": params}, ids, method="embed")
    ref, _, _ = lmodel.apply({"params": params}, embeds, pos,
                             jnp.ones((B, S), bool))
    out, _, _ = bmodel.apply({"params": merged}, embeds, pos,
                             jnp.ones((B, S), bool))
    np.testing.assert_allclose(np.asarray(ref, np.float32),
                               np.asarray(out, np.float32), atol=5e-2,
                               rtol=1e-2)
