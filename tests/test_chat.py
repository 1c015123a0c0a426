"""Multi-turn interleaved chat (seedx_tpu/inference/chat.py).

The reference ships no multi-turn driver; the chat format under test is its
training format (reference: src/data/sft_clm.py:230-272) — [INST] turns
joined over a shared image-feature history.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from seedx_tpu.inference.chat import ChatSession
from seedx_tpu.inference.runtime import SeedXRuntime


@pytest.fixture(scope="module")
def rt():
    return SeedXRuntime.debug(image_size=56)


@pytest.fixture()
def image():
    rng = np.random.RandomState(0)
    return Image.fromarray(rng.randint(0, 255, (64, 48, 3), np.uint8))


def test_build_prompt_format(rt):
    from seedx_tpu.inference.chat import Turn
    s = ChatSession(rt, system_message="sys")
    s.turns.extend([Turn("user", "hi"), Turn("assistant", "hello"),
                    Turn("user", "again", num_patches=1)])
    p = s._build_prompt()
    assert p.startswith("sys\n[INST] hi [/INST]\n")
    assert "hello" in p
    # second user turn is newline-joined and carries one image span
    assert "\n[INST] <img>" in p
    assert p.count("[INST]") == 2


def test_two_turn_chat_with_image(rt, image):
    s = ChatSession(rt)
    r1 = s.send("describe", image=image, max_new_tokens=4)
    assert isinstance(r1["text"], str)
    assert len(s.turns) == 2
    # follow-up turn re-encodes the full history against the stored features
    r2 = s.send("more detail", max_new_tokens=4)
    assert isinstance(r2["text"], str)
    assert len(s.turns) == 4
    assert len(s._image_embeds) >= 1


def test_add_generated_resizes_to_context_grid(rt):
    s = ChatSession(rt)
    d = rt.agent_cfg.vit_dim
    nq = rt.vit_cfg.n_queries
    # a generated span on a smaller grid than the context token grid
    small = jnp.ones((1, nq // 4, d), jnp.bfloat16)
    s._add_generated(small)
    assert s._image_embeds[-1].shape == (1, nq, d)
    # same grid: stored untouched
    same = jnp.ones((1, nq, d), jnp.bfloat16)
    s._add_generated(same)
    assert s._image_embeds[-1].shape == (1, nq, d)
    assert len(s._patch_positions) == 2


def test_prefix_cache_matches_full_prefill(rt, image):
    """Three turns (image in turn 1): the prefix-cached session must produce
    token-identical replies to the full-reprefill session, and turns 2+ must
    actually reuse a cached prefix."""
    a = ChatSession(rt, prefix_cache=True, cache_capacity=512)
    b = ChatSession(rt, prefix_cache=False)
    sends = [("describe", image), ("more detail", None), ("and now?", None)]
    for i, (text, img) in enumerate(sends):
        ra = a.send(text, image=img, max_new_tokens=5)
        rb = b.send(text, image=img, max_new_tokens=5)
        assert ra["text"] == rb["text"], i
        assert ra["num_gen_imgs"] == rb["num_gen_imgs"]
        if i > 0:
            assert a.last_reused > 0, i   # delta prefill, not a re-prefill
    # history bookkeeping stayed in sync
    assert len(a.turns) == len(b.turns) == 6


def test_prefix_cache_reembeds_generated_image_spans(rt):
    """A reply containing an image span writes that span's KV from plain
    token-id embeddings during decode; the next turn's serialized history is
    token-identical through the span, but its KV must NOT be reused — the
    delta prefill has to re-embed the span with the generated image's
    features (round-1 advisor finding, high severity)."""
    from seedx_tpu.inference.chat import Turn

    a = ChatSession(rt, prefix_cache=True, cache_capacity=1024)
    b = ChatSession(rt, prefix_cache=False)
    ra = a.send("hi", max_new_tokens=4)
    rb = b.send("hi", max_new_tokens=4)
    assert ra["text"] == rb["text"]

    # Simulate a span-only image reply (the debug model rarely emits <img>
    # spontaneously): register generated features and rewrite the assistant
    # turn in BOTH sessions exactly as send() does after has_img_output.
    rng = np.random.RandomState(1)
    d = rt.agent_cfg.vit_dim
    n_out = rt.agent_cfg.num_img_out_tokens
    feat = jnp.asarray(rng.randn(1, n_out, d), jnp.bfloat16)
    for s in (a, b):
        s._add_generated(feat)
        s.turns[-1] = Turn("assistant", "", 1)

    # Fill session a's cache rows for the span the way decode would have:
    # a delta prefill of the serialized span ids from PLAIN token embeddings
    # (full_mask all False), then reset the record to "decode produced these".
    tok = rt.tokenizer
    ids_hist = [tok.bos_token_id] + tok.encode(a._build_prompt())
    a._generate_cached(ids_hist, None, None, None, max_new_tokens=1)
    a._cached_ids = list(ids_hist)
    a._cached_cmp = [False] * len(ids_hist)
    boi_pos = ids_hist.index(tok.vocab.boi) if hasattr(tok, "vocab") else None

    ra = a.send("what about it?", max_new_tokens=5)
    rb = b.send("what about it?", max_new_tokens=5)
    assert ra["text"] == rb["text"]
    assert ra["num_gen_imgs"] == rb["num_gen_imgs"]
    # a prefix WAS reused, but reuse stopped at the span boundary
    assert a.last_reused > 0
    if boi_pos is not None:
        assert a.last_reused <= boi_pos + 1


def test_prefix_cache_capacity_regrow(rt):
    """Exceeding the cache capacity rebuilds it (full re-prefill) without
    changing results."""
    a = ChatSession(rt, prefix_cache=True, cache_capacity=64)
    b = ChatSession(rt, prefix_cache=False)
    long_text = "word " * 40      # forces capacity growth on a later turn
    for text in ("hi", long_text):
        ra = a.send(text, max_new_tokens=4)
        rb = b.send(text, max_new_tokens=4)
        assert ra["text"] == rb["text"]


def test_chat_spec_decode_matches_plain(rt, image):
    """spec_k must not change replies in either chat mode: prefix-cached
    spec rounds run against the session cache (absolute positions) and the
    fallback path routes through generate_batch's spec engine."""
    a = ChatSession(rt, prefix_cache=True, cache_capacity=512)
    b = ChatSession(rt, prefix_cache=True, cache_capacity=512)
    c = ChatSession(rt, prefix_cache=False)
    sends = [("describe the thing", image), ("again, more detail", None),
             ("and once more", None)]
    for i, (text, img) in enumerate(sends):
        ra = a.send(text, image=img, max_new_tokens=6)
        rb = b.send(text, image=img, max_new_tokens=6, spec_k=3)
        rc = c.send(text, image=img, max_new_tokens=6, spec_k=3)
        assert ra["text"] == rb["text"] == rc["text"], i
        if i > 0:
            assert b.last_reused > 0, i   # spec didn't break prefix reuse
