"""Paged-KV continuous serving: result parity vs the dense-slot engine.

The paged engine (ContinuousEngine(paged=True)) must reproduce the dense
engine's outputs while holding only ceil((p_len + budget)/page) KV tiles
per request from a shared pool (vLLM-style; no reference counterpart —
the reference serves one prompt at a time via HF generate).
"""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from seedx_tpu.inference.continuous import ContinuousEngine
from seedx_tpu.models.agent import AgentConfig, ContinuousLVLM
from seedx_tpu.models.llama import llama_debug
from seedx_tpu.text.tokenizer import ByteFallbackTokenizer


@pytest.fixture(scope="module")
def int4_rt():
    """Tiny int4 agent runtime with the stacked decode loop + ragged
    attention forced on (the paged-serving configuration, CPU interpret)."""
    from seedx_tpu.ops import int4_matmul as m
    m.FORCE_KERNEL = True

    llm_cfg = llama_debug(hidden_size=128, intermediate_size=256,
                          num_layers=2, num_heads=4, num_kv_heads=4,
                          quantization="int4", kv_quantization="int8",
                          stacked_decode="force", decode_attention="force",
                          remat=False)
    agent_cfg = AgentConfig(llm=llm_cfg, vit_dim=64, resampler_heads=4,
                            num_img_in_tokens=64, num_img_out_tokens=4,
                            vit_down=False)
    model = ContinuousLVLM(agent_cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    attn = jnp.ones((1, 8), bool)
    img = jnp.zeros((1, 4, 64), jnp.bfloat16)
    fmask = jnp.zeros((1,), bool)
    idsm = jnp.zeros((1, 8), bool)
    shapes = nn.meta.unbox(jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), ids, attn,
                           jnp.where(attn, ids, -100), img, fmask, fmask,
                           idsm, idsm, jnp.full((1, 2), 0.5),
                           method="init_all"))["params"])

    def fill(path, x):
        key = jax.random.PRNGKey(hash(str(path)) % (2 ** 31))
        if x.dtype == jnp.int8:
            return jax.random.randint(key, x.shape, -127, 128, jnp.int32
                                      ).astype(jnp.int8)
        if x.dtype == jnp.uint8:
            return jax.random.randint(key, x.shape, 0, 256, jnp.int32
                                      ).astype(jnp.uint8)
        return (jax.random.normal(key, x.shape, jnp.float32) * 0.02
                ).astype(x.dtype)

    params = jax.jit(lambda: jax.tree_util.tree_map_with_path(fill,
                                                              shapes))()
    yield types.SimpleNamespace(agent=model, agent_params=params,
                                agent_cfg=agent_cfg,
                                tokenizer=ByteFallbackTokenizer())
    m.FORCE_KERNEL = False


def _requests(tok, texts):
    return [{"input_ids": [tok.bos_token_id] + tok.encode(t),
             "image_embeds": None, "embeds_cmp_mask": None,
             "ids_cmp_mask": None, "patch_positions": None}
            for t in texts]


TEXTS = ["hello world", "abc abc abc", "the cat sat on the mat",
         "one two three four"]


def _drain(rt, paged, **kw):
    eng = ContinuousEngine(rt, slots=2, max_new_tokens=8, chunk_steps=4,
                           prompt_buckets=(16, 32), page_size=8,
                           paged=paged, **kw)
    ids = [eng.submit(r) for r in _requests(rt.tokenizer, TEXTS)]
    res = eng.run()
    return [res[i] for i in ids], eng


def test_paged_matches_dense(int4_rt):
    dense, _ = _drain(int4_rt, paged=False)
    paged, eng = _drain(int4_rt, paged=True)
    for d, p in zip(dense, paged):
        assert list(d["tokens"]) == list(p["tokens"])
        assert d["text"] == p["text"]
    # every tile returned to the pool after the drain
    st = eng.stats()
    assert st["kv_tiles_free"] == st["kv_tiles_total"]


def test_paged_small_pool_defers_and_completes(int4_rt):
    """A pool too small for all requests at once still drains correctly —
    requests wait for tiles and admit as slots harvest."""
    # slots=2, bucket up to 32, budget 8 -> <=5 tiles/request at page 8.
    # 11 usable tiles: two live requests (<=10 tiles) but never three.
    dense, _ = _drain(int4_rt, paged=False)
    paged, eng = _drain(int4_rt, paged=True, pool_tokens=12 * 8)
    for d, p in zip(dense, paged):
        assert list(d["tokens"]) == list(p["tokens"])
    st = eng.stats()
    assert st["kv_tiles_free"] == st["kv_tiles_total"] == 11


def test_paged_rejects_oversized_request(int4_rt):
    eng = ContinuousEngine(int4_rt, slots=2, max_new_tokens=8,
                           chunk_steps=4, prompt_buckets=(16, 32),
                           page_size=8, paged=True, pool_tokens=3 * 8)
    with pytest.raises(ValueError, match="KV tiles"):
        eng.submit(_requests(int4_rt.tokenizer,
                             ["the cat sat on the mat"])[0])


def test_paged_requires_int4_stacked():
    from seedx_tpu.inference.runtime import SeedXRuntime

    rt = SeedXRuntime.debug()      # bf16 debug agent
    with pytest.raises(ValueError, match="paged KV"):
        ContinuousEngine(rt, slots=2, paged=True)


def test_paged_fused_matches_dense(int4_rt):
    """Fused (chunked) prefill composes with paged KV: prompt windows
    write through the slot's block table (the multi-query ragged stair,
    ops/decode_attention.py) and results match the legacy dense engine
    token-for-token at every prefill width."""
    dense, _ = _drain(int4_rt, paged=False, fused_prefill=False)
    for w in (2, 64):
        paged, eng = _drain(int4_rt, paged=True, fused_prefill=True,
                            prefill_width=w)
        for d, p in zip(dense, paged):
            assert list(d["tokens"]) == list(p["tokens"]), w
        st = eng.stats()
        assert st["kv_tiles_free"] == st["kv_tiles_total"]


def test_paged_mid_flight_submit_and_reuse(int4_rt):
    """Tiles freed by finished requests are reused by later admissions
    (and the dense engine agrees on every result)."""
    eng = ContinuousEngine(int4_rt, slots=2, max_new_tokens=8,
                           chunk_steps=4, prompt_buckets=(16, 32),
                           page_size=8, paged=True, pool_tokens=12 * 8)
    reqs = _requests(int4_rt.tokenizer, TEXTS)
    first = [eng.submit(r) for r in reqs[:2]]
    eng.step()
    late = [eng.submit(r) for r in reqs[2:]]
    res = eng.run()
    dense, _ = _drain(int4_rt, paged=False)
    for rid, want in zip(first + late, dense):
        assert list(res[rid]["tokens"]) == list(want["tokens"])
