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
