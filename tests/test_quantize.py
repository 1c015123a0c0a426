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


def test_int8_kv_cache_decode_matches_bf16():
    """int8 KV cache (per-position/head absmax scales) must track the bf16
    cache through prefill + several decode steps — same params, same inputs."""
    from flax import linen as nn

    from seedx_tpu.models.llama import init_kv_cache

    cfg = llama_debug(hidden_size=128, intermediate_size=256, num_layers=2,
                      num_heads=4, num_kv_heads=4)
    qcfg = llama_debug(hidden_size=128, intermediate_size=256, num_layers=2,
                       num_heads=4, num_kv_heads=4, kv_quantization="int8")
    model = LlamaForCausalLM(cfg)
    qmodel = LlamaForCausalLM(qcfg)

    B, P, T = 2, 16, 8
    total = P + T
    ids = jax.random.randint(jax.random.PRNGKey(0), (B, P), 0, cfg.vocab_size)
    positions = jnp.broadcast_to(jnp.arange(P), (B, P))
    params = nn.meta.unbox(model.init(jax.random.PRNGKey(0), ids, positions,
                                      method="init_all")["params"])
    embeds = model.apply({"params": params}, ids, method="embed")

    def run(m, c):
        cache = init_kv_cache(c, B, total)
        kv_valid = jnp.arange(total)[None, :] < P
        logits, _, cache = m.apply({"params": params}, embeds, positions,
                                   kv_valid, cache, 0)
        toks = [jnp.argmax(logits[:, -1], -1)]
        for t in range(T - 1):
            emb = m.apply({"params": params}, toks[-1][:, None],
                          method="embed")
            kv_valid = jnp.arange(total)[None, :] < P + t + 1
            lg, _, cache = m.apply({"params": params}, emb,
                                   jnp.full((B, 1), P + t), kv_valid, cache,
                                   P + t)
            toks.append(jnp.argmax(lg[:, 0], -1))
        return np.stack([np.asarray(t) for t in toks], 1)

    ref = run(model, cfg)
    out = run(qmodel, qcfg)
    # greedy token streams agree (int8 cache error ~0.4% of amax per entry)
    assert (ref == out).mean() > 0.85

    from seedx_tpu.models.llama import kv_scale_width

    qc = init_kv_cache(qcfg, B, total)
    assert len(qc) == 4 and qc[0].dtype == jnp.int8
    # flat [layers, batch, max_len, heads*dim] + per-head scales, lane-
    # padded to 128 for the ragged-decode DMA (decode_attention != "never")
    assert qc[0].shape == (2, B, total, 128)
    assert kv_scale_width(qcfg) == 128
    assert qc[2].shape == (2, B, total, 128)
    # with the ragged kernel off the compact scale layout is kept
    ncfg = llama_debug(hidden_size=128, intermediate_size=256, num_layers=2,
                       num_heads=4, num_kv_heads=4, kv_quantization="int8",
                       decode_attention="never")
    nc = init_kv_cache(ncfg, B, total)
    assert nc[2].shape == (2, B, total, 4)


def test_int8_full_llama_matches_fp():
    """int8_full (projections + embedding + lm_head) still tracks the fp
    forward: same params quantized with full=True, argmax agreement high."""
    from flax import linen as nn

    cfg = llama_debug(hidden_size=128, intermediate_size=256, num_layers=2,
                      num_heads=4, num_kv_heads=4)
    qcfg = llama_debug(hidden_size=128, intermediate_size=256, num_layers=2,
                       num_heads=4, num_kv_heads=4, quantization="int8_full")
    model = LlamaForCausalLM(cfg)
    qmodel = LlamaForCausalLM(qcfg)

    B, S = 1, 16
    ids = jax.random.randint(jax.random.PRNGKey(0), (B, S), 0, cfg.vocab_size)
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    params = nn.meta.unbox(model.init(jax.random.PRNGKey(0), ids, positions,
                                      method="init_all")["params"])
    qparams = jax.tree.map(jnp.asarray, quantize_llama_params(
        jax.tree.map(np.asarray, params), full=True))

    # quantized embedding path replaces .embed too
    embeds = model.apply({"params": params}, ids, method="embed")
    qembeds = qmodel.apply({"params": qparams}, ids, method="embed")
    np.testing.assert_allclose(np.asarray(embeds, np.float32),
                               np.asarray(qembeds, np.float32), atol=2e-3)

    ref, _, _ = model.apply({"params": params}, embeds, positions,
                            jnp.ones((B, S), bool))
    out, _, _ = qmodel.apply({"params": qparams}, qembeds, positions,
                             jnp.ones((B, S), bool))
    ref = np.asarray(ref, np.float32)
    out = np.asarray(out, np.float32)
    assert np.mean(np.abs(ref - out)) < 0.15
    assert (ref.argmax(-1) == out.argmax(-1)).mean() > 0.9


def test_int4_kernel_roundtrip():
    """Pack/unpack identity: dequantizing with the identity input must
    reproduce W within the absmax/7 rounding bound."""
    from seedx_tpu.ops.int4_matmul import int4_matmul_xla
    from seedx_tpu.utils.quantize import quantize_kernel_int4

    rng = np.random.default_rng(0)
    w = rng.normal(size=(256, 64)).astype(np.float32)
    packed, scale = quantize_kernel_int4(w, group=128)
    assert packed.shape == (128, 64) and packed.dtype == np.uint8
    assert scale.shape == (2, 64)
    eye = jnp.eye(256, dtype=jnp.bfloat16)
    rec = np.asarray(int4_matmul_xla(eye, jnp.asarray(packed),
                                     jnp.asarray(scale), group=128),
                     np.float32)
    # absmax/7 symmetric: error bounded by scale/2 (+ bf16 dequant noise)
    gmax = np.repeat(scale, 128, axis=0)
    assert np.all(np.abs(rec - w) <= gmax * 0.5 + 0.02)


def test_int4_pallas_kernel_matches_xla():
    """The Pallas int4 matmul (interpret mode on CPU) == the XLA unpack+dot
    reference on the same packed operands."""
    from seedx_tpu.ops.int4_matmul import int4_matmul, int4_matmul_xla
    from seedx_tpu.utils.quantize import quantize_kernel_int4

    rng = np.random.default_rng(1)
    n_in, n_out, rows = 256, 512, 4
    w = rng.normal(size=(n_in, n_out)).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(rows, n_in)), jnp.bfloat16)
    packed, scale = quantize_kernel_int4(w, group=128)
    ref = int4_matmul_xla(x, jnp.asarray(packed), jnp.asarray(scale),
                          group=128)
    out = int4_matmul(x, jnp.asarray(packed), jnp.asarray(scale),
                      group=128, block_out=256, interpret=True)
    assert out.shape == (rows, n_out)
    # the kernel is W4A8 (per-row int8 activations) while the XLA reference
    # is W4A16: tolerance covers the ~amax/254-per-term activation rounding
    ref = np.asarray(ref, np.float32)
    err = np.abs(np.asarray(out, np.float32) - ref)
    rms = float(np.sqrt(np.mean(ref ** 2)))
    assert np.mean(err) < 0.02 * rms
    assert np.max(err) < 0.1 * rms


def test_int4_llama_matches_fp():
    """int4 projections + int8 embed/lm_head still track the fp forward
    well enough for greedy agreement on most positions."""
    from flax import linen as nn

    cfg = llama_debug(hidden_size=128, intermediate_size=256, num_layers=2,
                      num_heads=4, num_kv_heads=4)
    qcfg = llama_debug(hidden_size=128, intermediate_size=256, num_layers=2,
                       num_heads=4, num_kv_heads=4, quantization="int4")
    model = LlamaForCausalLM(cfg)
    qmodel = LlamaForCausalLM(qcfg)

    B, S = 1, 16
    ids = jax.random.randint(jax.random.PRNGKey(0), (B, S), 0, cfg.vocab_size)
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    params = nn.meta.unbox(model.init(jax.random.PRNGKey(0), ids, positions,
                                      method="init_all")["params"])
    qparams = jax.tree.map(jnp.asarray, quantize_llama_params(
        jax.tree.map(np.asarray, params), mode="int4"))

    embeds = model.apply({"params": params}, ids, method="embed")
    qembeds = qmodel.apply({"params": qparams}, ids, method="embed")
    ref, _, _ = model.apply({"params": params}, embeds, positions,
                            jnp.ones((B, S), bool))
    out, _, _ = qmodel.apply({"params": qparams}, qembeds, positions,
                             jnp.ones((B, S), bool))
    ref = np.asarray(ref, np.float32)
    out = np.asarray(out, np.float32)
    # int4 RTN is lossier than int8: bound the drift, demand majority
    # greedy agreement (group scales keep per-weight error ~ scale/2)
    assert np.mean(np.abs(ref - out)) < 0.5
    assert (ref.argmax(-1) == out.argmax(-1)).mean() > 0.6


def test_int4_pallas_kernel_prefill_rows():
    """The row-blocked grid (prefill-sized inputs) matches the XLA path."""
    from seedx_tpu.ops.int4_matmul import int4_matmul, int4_matmul_xla
    from seedx_tpu.utils.quantize import quantize_kernel_int4

    rng = np.random.default_rng(2)
    n_in, n_out, rows = 256, 512, 200   # rows > block_rows -> 2D grid, padded
    w = rng.normal(size=(n_in, n_out)).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(rows, n_in)), jnp.bfloat16)
    packed, scale = quantize_kernel_int4(w, group=128)
    ref = np.asarray(int4_matmul_xla(x, jnp.asarray(packed),
                                     jnp.asarray(scale), group=128),
                     np.float32)
    out = np.asarray(int4_matmul(x, jnp.asarray(packed), jnp.asarray(scale),
                                 group=128, block_out=256, block_rows=64,
                                 interpret=True), np.float32)
    assert out.shape == (rows, n_out)
    rms = float(np.sqrt(np.mean(ref ** 2)))
    assert np.mean(np.abs(out - ref)) < 0.02 * rms
    assert np.max(np.abs(out - ref)) < 0.1 * rms


def test_int8_unet_matches_fp():
    """UNetConfig(quantize='int8') + quantize_unet_params: eps prediction
    close to the fp UNet (serving path for the 2.6B UNet; the LLM already
    has this ladder, PARITY row 28)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from seedx_tpu.models.sdxl.unet import UNet2DCondition, sdxl_debug_unet
    from seedx_tpu.utils.quantize import quantize_unet_params

    ucfg = sdxl_debug_unet(dtype=jnp.float32)
    unet = UNet2DCondition(ucfg)
    rng = jax.random.PRNGKey(0)
    pooled_dim = (ucfg.projection_class_embeddings_input_dim
                  - 6 * ucfg.addition_time_embed_dim)
    lat = jax.random.normal(rng, (2, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (2, 8, ucfg.cross_attention_dim))
    pooled = jax.random.normal(jax.random.PRNGKey(2), (2, pooled_dim))
    tids = jnp.asarray([[512.0, 512.0, 0.0, 0.0, 512.0, 512.0]] * 2)
    params = unet.init(rng, lat, jnp.array([3.0, 3.0]), ctx, pooled,
                       tids)["params"]
    ref = unet.apply({"params": params}, lat, jnp.array([3.0, 3.0]), ctx,
                     pooled, tids)

    import dataclasses

    qcfg = dataclasses.replace(ucfg, quantize="int8")
    qparams = quantize_unet_params(jax.tree.map(np.asarray, params))
    out = UNet2DCondition(qcfg).apply({"params": qparams}, lat,
                                      jnp.array([3.0, 3.0]), ctx, pooled,
                                      tids)
    rel = (np.linalg.norm(np.asarray(out - ref))
           / np.linalg.norm(np.asarray(ref)))
    assert rel < 0.05, rel


def test_adapter_quantize_unet_generates():
    """SDXLAdapter.quantize_unet(): the full generate path runs and stays
    close to the fp adapter's output."""
    import numpy as np

    from seedx_tpu.inference import SeedXRuntime

    rt = SeedXRuntime.debug(with_adapter=True)
    feats = np.random.RandomState(0).randn(
        1, rt.agent_cfg.num_img_out_tokens, rt.agent_cfg.vit_dim
    ).astype(np.float32)
    ref = rt.adapter.generate(feats, seed=1, num_inference_steps=2)
    rt.adapter.quantize_unet()
    out = rt.adapter.generate(feats, seed=1, num_inference_steps=2)
    assert out.shape == ref.shape
    # decoded pixels in [0,1]; int8 weight rounding stays visually identical
    assert np.mean(np.abs(np.asarray(out) - np.asarray(ref))) < 0.05


def _int4_debug_model(stacked_decode, lora_rank=0, kv_quantization="none",
                      decode_attention="auto"):
    cfg = llama_debug(hidden_size=128, intermediate_size=256, num_layers=2,
                      num_heads=4, num_kv_heads=4, quantization="int4",
                      lora_rank=lora_rank, kv_quantization=kv_quantization,
                      stacked_decode=stacked_decode,
                      decode_attention=decode_attention, remat=False)
    return cfg, LlamaForCausalLM(cfg)


def _int4_debug_params(model, cfg):
    from flax import linen as nn

    ids = jnp.zeros((1, 8), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(8), (1, 8))
    fp_cfg = llama_debug(hidden_size=128, intermediate_size=256, num_layers=2,
                         num_heads=4, num_kv_heads=4,
                         lora_rank=cfg.lora_rank, remat=False)
    fp = LlamaForCausalLM(fp_cfg)
    params = nn.meta.unbox(fp.init(jax.random.PRNGKey(0), ids, pos,
                                   method="init_all")["params"])
    return jax.tree.map(jnp.asarray, quantize_llama_params(
        jax.tree.map(np.asarray, params), mode="int4"))


def _decode_tokens(model, cfg, params, prompt, steps, per_row_offset=False):
    """Prefill + greedy decode `steps` tokens; returns (tokens, cache)."""
    from seedx_tpu.models.llama import init_kv_cache

    B, S = prompt.shape
    total = S + steps
    cache = init_kv_cache(cfg, B, total)
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    embeds = model.apply({"params": params}, prompt, method="embed")
    kv_valid = jnp.arange(total)[None, :] < S
    logits, _, cache = model.apply({"params": params}, embeds, pos,
                                   kv_valid, cache, 0)
    token = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    toks = [token]
    for t in range(steps - 1):
        idx = S + t
        cache_index = (jnp.full((B,), idx, jnp.int32) if per_row_offset
                       else idx)
        emb = model.apply({"params": params}, token[:, None], method="embed")
        kv_valid = jnp.arange(total)[None, :] < idx + 1
        lg, _, cache = model.apply({"params": params}, emb,
                                   jnp.full((B, 1), idx), kv_valid, cache,
                                   cache_index)
        token = jnp.argmax(lg[:, 0], -1).astype(jnp.int32)
        toks.append(token)
    return np.asarray(jnp.stack(toks, 1)), cache


def test_stacked_decode_matches_scan(monkeypatch):
    """The fori_loop + int4_matmul_stacked decode path (decode_stacked.py)
    is token-exact and cache-exact vs the nn.scan path on the same params.

    Both paths are forced through the W4A8 Pallas kernel (interpret mode on
    CPU) so the comparison is same-numerics; without the hook the scan path
    would take the bf16 XLA fallback off-TPU."""
    from seedx_tpu.ops import int4_matmul as m
    monkeypatch.setattr(m, "FORCE_KERNEL", True)
    cfg_n, model_n = _int4_debug_model("never")
    cfg_f, model_f = _int4_debug_model("force")
    params = _int4_debug_params(model_n, cfg_n)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0,
                                cfg_n.vocab_size)
    ref_toks, ref_cache = _decode_tokens(model_n, cfg_n, params, prompt, 4)
    out_toks, out_cache = _decode_tokens(model_f, cfg_f, params, prompt, 4)
    np.testing.assert_array_equal(ref_toks, out_toks)
    for r, o in zip(ref_cache, out_cache):
        np.testing.assert_allclose(np.asarray(r, np.float32),
                                   np.asarray(o, np.float32), atol=2e-2)


def test_stacked_decode_matches_scan_lora_int8kv_perrow(monkeypatch):
    """Same parity with LoRA deltas, int8 KV cache, and per-row offsets
    (the continuous-batching decode contract)."""
    from seedx_tpu.ops import int4_matmul as m
    monkeypatch.setattr(m, "FORCE_KERNEL", True)
    cfg_n, model_n = _int4_debug_model("never", lora_rank=4,
                                       kv_quantization="int8")
    cfg_f, model_f = _int4_debug_model("force", lora_rank=4,
                                       kv_quantization="int8")
    params = _int4_debug_params(model_n, cfg_n)
    prompt = jax.random.randint(jax.random.PRNGKey(2), (2, 9), 0,
                                cfg_n.vocab_size)
    ref_toks, _ = _decode_tokens(model_n, cfg_n, params, prompt, 3,
                                 per_row_offset=True)
    out_toks, _ = _decode_tokens(model_f, cfg_f, params, prompt, 3,
                                 per_row_offset=True)
    np.testing.assert_array_equal(ref_toks, out_toks)


def test_stacked_decode_ragged_attention_parity(monkeypatch):
    """decode_attention="force" (the ragged Pallas window kernel,
    ops/decode_attention.py) matches the XLA attention inside the same
    stacked loop — bf16 AND int8 KV, per-row offsets.

    Teacher-forced logits comparison, not greedy tokens: the kernel keeps
    the p@v accumulation in fp32 where the XLA path rounds probs to bf16
    first, so logits agree only to ~1 bf16 ulp of the hidden state and a
    greedy near-tie may legitimately flip."""
    from seedx_tpu.models.llama import init_kv_cache
    from seedx_tpu.ops import int4_matmul as m
    monkeypatch.setattr(m, "FORCE_KERNEL", True)

    def forced_logits(model, cfg, params, prompt, forced):
        B, S = prompt.shape
        steps = forced.shape[1]
        total = S + steps
        cache = init_kv_cache(cfg, B, total)
        pos = jnp.broadcast_to(jnp.arange(S), (B, S))
        embeds = model.apply({"params": params}, prompt, method="embed")
        kv_valid = jnp.arange(total)[None, :] < S
        logits, _, cache = model.apply({"params": params}, embeds, pos,
                                       kv_valid, cache, 0)
        lgs = [np.asarray(logits[:, -1], np.float32)]
        for t in range(steps - 1):
            idx = S + t
            emb = model.apply({"params": params}, forced[:, t][:, None],
                              method="embed")
            kv_valid = jnp.arange(total)[None, :] < idx + 1
            lg, _, cache = model.apply(
                {"params": params}, emb, jnp.full((B, 1), idx), kv_valid,
                cache, jnp.full((B,), idx, jnp.int32))
            lgs.append(np.asarray(lg[:, 0], np.float32))
        return np.stack(lgs, 1), cache

    for kvq in ("none", "int8"):
        cfg_x, model_x = _int4_debug_model("force", kv_quantization=kvq,
                                           decode_attention="never")
        cfg_r, model_r = _int4_debug_model("force", kv_quantization=kvq,
                                           decode_attention="force")
        params = _int4_debug_params(model_x, cfg_x)
        prompt = jax.random.randint(jax.random.PRNGKey(3), (2, 12), 0,
                                    cfg_x.vocab_size)
        forced = jax.random.randint(jax.random.PRNGKey(4), (2, 4), 0,
                                    cfg_x.vocab_size)
        ref_lg, ref_cache = forced_logits(model_x, cfg_x, params, prompt,
                                          forced)
        out_lg, out_cache = forced_logits(model_r, cfg_r, params, prompt,
                                          forced)
        rms = float(np.sqrt(np.mean(ref_lg ** 2)))
        assert np.abs(ref_lg - out_lg).max() < max(0.05, 0.01 * rms), kvq
        if kvq == "int8":
            # compare DEQUANTIZED K/V: raw code cells flip by ±2 when the
            # bf16-rounded scale itself moves an ulp between the paths.
            # Scale leaves are lane-padded to kv_scale_width — slice the
            # real [..., :num_kv_heads] scales back off before the repeat.
            nh = cfg_x.num_kv_heads
            rk = np.asarray(ref_cache[0], np.float32) * np.repeat(
                np.asarray(ref_cache[2], np.float32)[..., :nh],
                cfg_x.head_dim, -1)
            ok = np.asarray(out_cache[0], np.float32) * np.repeat(
                np.asarray(out_cache[2], np.float32)[..., :nh],
                cfg_x.head_dim, -1)
            np.testing.assert_allclose(rk, ok, atol=0.1)
        else:
            for r, o in zip(ref_cache, out_cache):
                np.testing.assert_allclose(np.asarray(r, np.float32),
                                           np.asarray(o, np.float32),
                                           atol=2e-2)


def test_int8_vit_matches_fp():
    """ViTConfig(quantization='int8') + quantize_vit_params: encode close
    to the fp trunk (serving memory fit; encode itself is compute-bound)."""
    from flax import linen as nn

    from seedx_tpu.models.vit import VisionTransformer, vit_tiny_debug
    from seedx_tpu.utils.quantize import quantize_vit_params

    cfg = vit_tiny_debug(image_size=56, dtype=jnp.float32)
    qcfg = vit_tiny_debug(image_size=56, dtype=jnp.float32,
                          quantization="int8")
    model = VisionTransformer(cfg, remat=False)
    qmodel = VisionTransformer(qcfg, remat=False)

    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 56, 56, 3))
    params = nn.meta.unbox(model.init(jax.random.PRNGKey(1), imgs)["params"])
    qparams = jax.tree.map(jnp.asarray, quantize_vit_params(
        jax.tree.map(np.asarray, params)))

    ref = np.asarray(model.apply({"params": params}, imgs), np.float32)
    out = np.asarray(qmodel.apply({"params": qparams}, imgs), np.float32)
    rms = float(np.sqrt(np.mean(ref ** 2)))
    assert np.sqrt(np.mean((ref - out) ** 2)) < 0.05 * rms


def test_export_serving_roundtrip_bit_exact(tmp_path):
    """export_serving saves the already-quantized int4 tree; restoring it
    gives bit-identical leaves and bit-identical logits — quantization
    happens exactly once, at export (utils/export.py)."""
    from seedx_tpu.train.checkpoints import restore_pytree
    from seedx_tpu.utils.export import export_serving

    cfg = llama_debug(hidden_size=128, intermediate_size=256, num_layers=2,
                      num_heads=4, num_kv_heads=4)
    qcfg = llama_debug(hidden_size=128, intermediate_size=256, num_layers=2,
                       num_heads=4, num_kv_heads=4, quantization="int4")
    model = LlamaForCausalLM(cfg)
    qmodel = LlamaForCausalLM(qcfg)
    B, S = 1, 16
    ids = jax.random.randint(jax.random.PRNGKey(0), (B, S), 0, cfg.vocab_size)
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    from flax import linen as nn

    params = nn.meta.unbox(model.init(jax.random.PRNGKey(0), ids, positions,
                                      method="init_all")["params"])

    qtree = export_serving(params, str(tmp_path / "llama_int4"), "llama")
    restored = restore_pytree(str(tmp_path / "llama_int4"))

    flat_q = jax.tree_util.tree_leaves_with_path(qtree)
    flat_r = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(restored)}
    assert len(flat_q) == len(flat_r)
    for path, leaf in flat_q:
        r = flat_r[jax.tree_util.keystr(path)]
        assert r.dtype == np.asarray(leaf).dtype
        assert np.array_equal(np.asarray(r), np.asarray(leaf))

    rp = jax.tree.map(jnp.asarray, restored)
    qp = jax.tree.map(jnp.asarray, qtree)
    embeds = qmodel.apply({"params": qp}, ids, method="embed")
    a, _, _ = qmodel.apply({"params": qp}, embeds, positions,
                           jnp.ones((B, S), bool))
    b, _, _ = qmodel.apply({"params": rp}, embeds, positions,
                           jnp.ones((B, S), bool))
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_export_serving_unet_family(tmp_path):
    """UNet family export produces the Conv8/Dense8 layout and restores
    bit-exact."""
    from seedx_tpu.models.sdxl.unet import UNet2DCondition, sdxl_debug_unet
    from seedx_tpu.train.checkpoints import restore_pytree
    from seedx_tpu.utils.export import export_serving

    ucfg = sdxl_debug_unet(dtype=jnp.float32)
    unet = UNet2DCondition(ucfg)
    pooled_dim = (ucfg.projection_class_embeddings_input_dim
                  - 6 * ucfg.addition_time_embed_dim)
    lat = jnp.zeros((1, 16, 16, ucfg.in_channels))
    ctx = jnp.zeros((1, 8, ucfg.cross_attention_dim))
    params = unet.init(jax.random.PRNGKey(0), lat, jnp.array([1.0]), ctx,
                       jnp.zeros((1, pooled_dim)), jnp.zeros((1, 6)))["params"]
    qtree = export_serving(params, str(tmp_path / "unet_int8"), "unet")
    restored = restore_pytree(str(tmp_path / "unet_int8"))
    flat = {jax.tree_util.keystr(p): v
            for p, v in jax.tree_util.tree_leaves_with_path(qtree)}
    assert any(k.endswith("'kernel_q']") for k in flat)
    for path, leaf in jax.tree_util.tree_leaves_with_path(restored):
        assert np.array_equal(np.asarray(leaf),
                              np.asarray(flat[jax.tree_util.keystr(path)]))
