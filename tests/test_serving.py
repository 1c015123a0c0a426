"""Bucket-batched serving engine (seedx_tpu/inference/serving.py)."""

import numpy as np
import pytest
from PIL import Image

from seedx_tpu.inference.runtime import SeedXRuntime
from seedx_tpu.inference.serving import ServingEngine


@pytest.fixture(scope="module")
def rt():
    return SeedXRuntime.debug(image_size=56)


@pytest.fixture()
def image():
    rng = np.random.RandomState(1)
    return Image.fromarray(rng.randint(0, 255, (72, 56, 3), np.uint8))


def test_flush_returns_submission_order(rt, image):
    eng = ServingEngine(rt, max_new_tokens=4)
    i0 = eng.submit_text_to_image("a cat")
    i1 = eng.submit_comprehend(image, "what?")
    i2 = eng.submit_raw({"input_ids": [rt.tokenizer.bos_token_id] +
                         rt.tokenizer.encode("hello")})
    assert (i0, i1, i2) == (0, 1, 2)
    res = eng.flush()
    assert len(res) == 3
    for r in res:
        assert isinstance(r["clean_text"], str)
        assert "images" in r
    # queue drained
    assert eng.flush() == []


def test_bucket_grouping_and_chunking(rt):
    """Requests split by prompt bucket and max_batch_size but results come
    back in submission order regardless."""
    eng = ServingEngine(rt, max_batch_size=2, max_new_tokens=4)
    short = [rt.tokenizer.bos_token_id] + rt.tokenizer.encode("hi")
    long = [rt.tokenizer.bos_token_id] + rt.tokenizer.encode("x " * 100)
    order = [eng.submit_raw({"input_ids": short}),
             eng.submit_raw({"input_ids": long}),
             eng.submit_raw({"input_ids": short}),
             eng.submit_raw({"input_ids": short})]
    res = eng.flush()
    assert len(res) == 4
    assert order == [0, 1, 2, 3]


def test_batched_results_match_single_runtime(rt, image):
    """Engine output for one comprehension == direct apps.comprehend."""
    from seedx_tpu.inference import apps

    ref = apps.comprehend(rt, image, "what?", max_new_tokens=4)
    eng = ServingEngine(rt, max_new_tokens=4)
    eng.submit_comprehend(image, "what?")
    out = eng.flush()[0]
    assert list(out["tokens"]) == list(ref["tokens"])
    assert out["clean_text"] == ref["clean_text"]
