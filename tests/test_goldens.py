"""Golden regression fixtures: fixed-seed debug-stack outputs committed to
the repo so cross-round refactors can't silently change engine behavior
(VERDICT r1 item 8).

The reference's own QA is golden demos (committed vis/*.jpg outputs from
demo_images/* inputs, SURVEY §4.1); this is the deterministic tiny-stack
analogue.  Tokens must match exactly; image tensors are compared through a
coarse pooled summary (bf16 denoise on one platform is deterministic, but
the summary keeps the golden file small and readable).

Regenerate after an INTENTIONAL behavior change with:
    SEEDX_REGEN_GOLDENS=1 python -m pytest tests/test_goldens.py -q
and commit the diff with an explanation.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from seedx_tpu.inference import SeedXRuntime
from seedx_tpu.inference import apps

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           "debug_stack.json")
REGEN = os.environ.get("SEEDX_REGEN_GOLDENS") == "1"


@pytest.fixture(scope="module")
def rt():
    return SeedXRuntime.debug(with_adapter=True)


@pytest.fixture()
def image():
    rng = np.random.RandomState(123)
    return Image.fromarray(rng.randint(0, 255, (96, 80, 3), np.uint8))


def _img_summary(arr):
    """[B, H, W, 3] float image batch -> compact stats for the golden file."""
    a = np.asarray(arr, np.float64)
    b, h, w, c = a.shape
    pooled = a.reshape(b, 4, h // 4, 4, w // 4, c).mean(axis=(2, 4))
    return {
        "shape": list(a.shape),
        "mean": round(float(a.mean()), 6),
        "std": round(float(a.std()), 6),
        "pooled": [round(float(x), 5) for x in pooled.reshape(-1)],
    }


def _check_or_regen(name, record, goldens):
    if REGEN:
        goldens[name] = record
        return
    assert name in goldens, f"golden '{name}' missing — regenerate"
    want = goldens[name]
    assert record["tokens"] == want["tokens"], name
    for key in ("image", ):
        if want.get(key) is None:
            assert record.get(key) is None, name
            continue
        got, exp = record[key], want[key]
        assert got["shape"] == exp["shape"], name
        assert abs(got["mean"] - exp["mean"]) < 5e-3, name
        assert abs(got["std"] - exp["std"]) < 5e-3, name
        np.testing.assert_allclose(got["pooled"], exp["pooled"], atol=2e-2,
                                   err_msg=name)


def _load():
    if os.path.exists(GOLDEN_PATH):
        return json.load(open(GOLDEN_PATH))
    assert REGEN, f"{GOLDEN_PATH} missing — run with SEEDX_REGEN_GOLDENS=1"
    return {}


def test_debug_stack_goldens(rt, image):
    goldens = _load()

    out = apps.comprehend(rt, image, "What is in this image?",
                          max_new_tokens=12)
    _check_or_regen("comprehend", {
        "tokens": [int(t) for t in out["tokens"]], "image": None}, goldens)

    out = apps.text_to_image(rt, "a red car", num_inference_steps=2,
                             max_new_tokens=8)
    _check_or_regen("text2img", {
        "tokens": [int(t) for t in out["tokens"]],
        "image": _img_summary(out["images"]) if out["images"] is not None
        else None}, goldens)

    out = apps.edit_image(rt, image, "make it blue", num_inference_steps=2,
                          max_new_tokens=8)
    _check_or_regen("edit", {
        "tokens": [int(t) for t in out["tokens"]],
        "image": _img_summary(out["images"]) if out["images"] is not None
        else None}, goldens)

    recon = apps.reconstruct(rt, image, num_inference_steps=2)
    _check_or_regen("reconstruct", {"tokens": [],
                                    "image": _img_summary(recon)}, goldens)

    recon_c = apps.reconstruct_with_condition(rt, image, image,
                                              num_inference_steps=2)
    _check_or_regen("reconstruct_cond", {"tokens": [],
                                         "image": _img_summary(recon_c)},
                    goldens)

    if REGEN:
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        json.dump(goldens, open(GOLDEN_PATH, "w"), indent=1)


def test_chat_goldens(rt, image):
    from seedx_tpu.inference.chat import ChatSession

    goldens = _load()
    s = ChatSession(rt)
    r1 = s.send("describe", image=image, max_new_tokens=8)
    r2 = s.send("more detail", max_new_tokens=8)
    _check_or_regen("chat", {
        "tokens": s._cached_ids, "image": None}, goldens)
    assert isinstance(r1["text"], str) and isinstance(r2["text"], str)

    if REGEN:
        json.dump(goldens, open(GOLDEN_PATH, "w"), indent=1)
