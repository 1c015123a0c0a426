"""Continuous (slot-based) batching engine (seedx_tpu/inference/continuous.py).

The substitute for serving-cluster testing: parity of every rolled-admission
result against the one-shot ``generate_batch`` path, on the debug stack.
"""

import numpy as np
import pytest
from PIL import Image

from seedx_tpu.inference.continuous import ContinuousEngine
from seedx_tpu.inference.runtime import SeedXRuntime
from seedx_tpu.models.generation import GenerationConfig, generate_batch
from seedx_tpu.text import prompts


@pytest.fixture(scope="module")
def rt():
    return SeedXRuntime.debug(image_size=56)


def _t2i_request(rt, caption):
    text = prompts.generation_prompt(caption)
    ids = [rt.tokenizer.bos_token_id] + rt.tokenizer.encode(text)
    return {"input_ids": ids, "image_embeds": None, "embeds_cmp_mask": None,
            "ids_cmp_mask": None, "patch_positions": None}


def _text_request(rt, text):
    ids = [rt.tokenizer.bos_token_id] + rt.tokenizer.encode(text)
    return {"input_ids": ids, "image_embeds": None, "embeds_cmp_mask": None,
            "ids_cmp_mask": None, "patch_positions": None}


def _reference(rt, request, max_new_tokens):
    gen_cfg = GenerationConfig(
        max_new_tokens=max_new_tokens,
        num_img_gen_tokens=rt.agent_cfg.num_img_out_tokens,
        eos_token_id=rt.tokenizer.eos_token_id,
        pad_token_id=rt.tokenizer.pad_token_id)
    return generate_batch(rt.agent, {"params": rt.agent_params},
                          rt.tokenizer, [dict(request)], gen_cfg=gen_cfg)[0]


def _assert_same(res, ref):
    assert list(res["tokens"]) == list(ref["tokens"])
    assert res["has_img_output"] == ref["has_img_output"]
    assert res["num_gen_imgs"] == ref["num_gen_imgs"]
    if ref["img_gen_feat"] is not None:
        a = np.asarray(res["img_gen_feat"], np.float32)
        r = np.asarray(ref["img_gen_feat"], np.float32)
        rel = np.abs(a - r).max() / (np.abs(r).max() + 1e-9)
        assert rel < 5e-2, rel


def test_continuous_matches_one_shot(rt):
    """Heterogeneous requests through the slot pool == one-shot generation,
    token-for-token, including image-span features."""
    t = 8
    reqs = [_t2i_request(rt, "a cat"),
            _text_request(rt, "hello there"),
            _t2i_request(rt, "blue mountains at dawn")]
    refs = [_reference(rt, r, t) for r in reqs]

    eng = ContinuousEngine(rt, slots=2, max_new_tokens=t, chunk_steps=3,
                           prompt_buckets=(64, 128))
    ids = [eng.submit(dict(r)) for r in reqs]
    results = eng.run()
    assert sorted(results) == sorted(ids)
    for rid, ref in zip(ids, refs):
        _assert_same(results[rid], ref)


def test_continuous_rolling_admission(rt):
    """More requests than slots: later requests admit into freed slots
    (slots=1 forces fully serial reuse); results still match one-shot."""
    t = 6
    reqs = [_text_request(rt, "one"), _text_request(rt, "two two"),
            _text_request(rt, "three three three")]
    refs = [_reference(rt, r, t) for r in reqs]

    eng = ContinuousEngine(rt, slots=1, max_new_tokens=t, chunk_steps=2,
                           prompt_buckets=(64,))
    ids = [eng.submit(dict(r)) for r in reqs]
    results = eng.run()
    for rid, ref in zip(ids, refs):
        _assert_same(results[rid], ref)


def test_continuous_per_request_budget(rt):
    """Per-request max_new_tokens: a short-budget row frees its slot early
    and matches a one-shot run at that budget; the long row is unaffected."""
    t = 8
    short = _text_request(rt, "short one")
    long = _t2i_request(rt, "a cat")
    ref_short = _reference(rt, short, 3)
    ref_long = _reference(rt, long, t)

    eng = ContinuousEngine(rt, slots=2, max_new_tokens=t, chunk_steps=2,
                           prompt_buckets=(64,))
    i_long = eng.submit(dict(long))
    i_short = eng.submit(dict(short), max_new_tokens=3)
    results = eng.run()
    _assert_same(results[i_short], ref_short)
    _assert_same(results[i_long], ref_long)


def test_continuous_mid_flight_submit(rt):
    """submit() between step() calls — a request admitted while another is
    mid-decode must not perturb the in-flight row."""
    t = 8
    r0 = _t2i_request(rt, "a cat")
    r1 = _text_request(rt, "late arrival")
    ref0 = _reference(rt, r0, t)
    ref1 = _reference(rt, r1, t)

    eng = ContinuousEngine(rt, slots=2, max_new_tokens=t, chunk_steps=2,
                           prompt_buckets=(64,))
    i0 = eng.submit(dict(r0))
    eng.step()                      # r0 is now mid-decode
    i1 = eng.submit(dict(r1))
    results = eng.run()
    _assert_same(results[i0], ref0)
    _assert_same(results[i1], ref1)


def test_continuous_sampling(rt):
    """do_sample: different seeds diverge; the constrained image-span
    forcing still produces the exact forced ids under sampling."""
    vocab = rt.tokenizer.vocab
    n_img = rt.agent_cfg.num_img_out_tokens
    span_req = {"input_ids": [1, 5, 7, vocab.boi], "image_embeds": None,
                "embeds_cmp_mask": None, "ids_cmp_mask": None,
                "patch_positions": None}
    text_req = _text_request(rt, "tell me something")

    outs = []
    for seed in (0, 1):
        eng = ContinuousEngine(rt, slots=2, max_new_tokens=6, chunk_steps=3,
                               prompt_buckets=(64,), do_sample=True,
                               temperature=2.0, top_p=0.95, seed=seed)
        i_span = eng.submit(dict(span_req))
        i_text = eng.submit(dict(text_req))
        res = eng.run()
        # forced span: first 6 tokens are exactly img_0..img_5
        want = list(range(vocab.img_token_start, vocab.img_token_start + 6))
        assert list(res[i_span]["tokens"]) == want, n_img
        outs.append(list(res[i_text]["tokens"]))
    assert outs[0] != outs[1]          # sampling actually samples


def test_continuous_rejects_overlong_prompt(rt):
    """Prompts longer than the largest bucket would scribble KV past the
    slot cache; submit must fail loudly instead."""
    eng = ContinuousEngine(rt, slots=1, max_new_tokens=4,
                           prompt_buckets=(64,))
    with pytest.raises(ValueError):
        eng.submit(_text_request(rt, "word " * 200))


def test_continuous_stats(rt):
    eng = ContinuousEngine(rt, slots=2, max_new_tokens=4, chunk_steps=2,
                           prompt_buckets=(64,))
    for text in ("a", "b b", "c c c"):
        eng.submit(_text_request(rt, text))
    assert eng.stats()["pending"] == 3
    eng.run()
    s = eng.stats()
    assert s["completed"] == s["submitted"] == 3
    assert s["pending"] == 0 and s["active_slots"] == 0
    assert s["generated_tokens"] > 0 and s["chunks"] >= 2
