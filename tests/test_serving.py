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


def test_tile_bucket_padding_matches_exact(image):
    """tile_buckets pads the ViT batch (bounding compiled programs); the
    returned embeds/patch_pos must be identical to the exact-shape path."""
    rt = SeedXRuntime.debug(image_size=56)
    e1, p1 = rt.encode_image_anyres(image)
    rt.tile_buckets = (e1.shape[0] + 3,)
    e2, p2 = rt.encode_image_anyres(image)
    assert e2.shape == e1.shape and p2.shape == p1.shape
    np.testing.assert_allclose(np.asarray(e1, np.float32),
                               np.asarray(e2, np.float32), atol=2e-2)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_batched_results_match_single_runtime(rt, image):
    """Engine output for one comprehension == direct apps.comprehend."""
    from seedx_tpu.inference import apps

    ref = apps.comprehend(rt, image, "what?", max_new_tokens=4)
    eng = ServingEngine(rt, max_new_tokens=4)
    eng.submit_comprehend(image, "what?")
    out = eng.flush()[0]
    assert list(out["tokens"]) == list(ref["tokens"])
    assert out["clean_text"] == ref["clean_text"]


def test_chunked_image_span_matches_batched_serial():
    """A prompt ending in <img> takes the forced-span chunk branch (65 image
    tokens in one prefill-into-cache forward).  Batching it with a
    desynchronised second prompt (not at <img>) forces the serial
    single-step path for the whole batch.  Greedy tokens must match exactly
    and the image feature must match numerically between the two paths."""
    import numpy as np

    from seedx_tpu.inference.runtime import SeedXRuntime
    from seedx_tpu.models.generation import GenerationConfig, generate_batch

    rt = SeedXRuntime.debug(image_size=56)
    vocab = rt.tokenizer.vocab
    n_img = rt.agent_cfg.num_img_out_tokens
    # prompt ends with <img>: the forced span starts at the very first step
    ids = [1, 5, 7, vocab.boi]
    gen_cfg = GenerationConfig(
        max_new_tokens=n_img + 6, num_img_gen_tokens=n_img,
        eos_token_id=rt.tokenizer.eos_token_id,
        pad_token_id=rt.tokenizer.pad_token_id)
    req = {"input_ids": ids, "image_embeds": None, "embeds_cmp_mask": None,
           "ids_cmp_mask": None, "patch_positions": None}
    # second row does NOT sit at <img>, so the batch cannot chunk
    req_text = dict(req, input_ids=[1, 5, 7, 9])

    single = generate_batch(rt.agent, {"params": rt.agent_params},
                            rt.tokenizer, [req], gen_cfg=gen_cfg)[0]
    mixed = generate_batch(rt.agent, {"params": rt.agent_params},
                           rt.tokenizer, [dict(req), req_text],
                           gen_cfg=gen_cfg)
    assert single["has_img_output"]
    row = mixed[0]
    assert np.array_equal(single["tokens"], row["tokens"])
    a = np.asarray(single["img_gen_feat"], np.float32)
    r = np.asarray(row["img_gen_feat"], np.float32)
    rel = np.abs(a - r).max() / (np.abs(r).max() + 1e-9)
    assert rel < 5e-2, rel

    # batched SAME-structure prompts chunk together and still match
    double = generate_batch(rt.agent, {"params": rt.agent_params},
                            rt.tokenizer, [dict(req), dict(req)],
                            gen_cfg=gen_cfg)
    for row in double:
        assert np.array_equal(single["tokens"], row["tokens"])


def test_serve_cli_both_engines(tmp_path, monkeypatch, capsys):
    """`eval_cli serve`: JSONL requests in, JSONL results out, for both the
    bucket-batched and the continuous engine."""
    import json

    from seedx_tpu.inference import eval_cli

    shared = SeedXRuntime.debug(with_adapter=True)
    monkeypatch.setattr(eval_cli, "_load_runtime", lambda a: shared)
    img_path = tmp_path / "src.png"
    Image.fromarray(np.random.RandomState(2).randint(
        0, 255, (60, 48, 3), np.uint8)).save(img_path)
    reqs = [{"kind": "raw", "text": "hello"},
            {"kind": "t2i", "caption": "a cat"},
            {"kind": "edit", "image": str(img_path),
             "instruction": "make it blue"}]
    f = tmp_path / "reqs.jsonl"
    f.write_text("\n".join(json.dumps(r) for r in reqs) + "\n")

    per_engine = {}
    for engine in ("batched", "continuous"):
        rc = eval_cli.main(["serve", "--requests", str(f),
                            "--engine", engine, "--debug",
                            "--max_new_tokens", "6",
                            "--num_inference_steps", "2",
                            "--out_dir", str(tmp_path / "vis")])
        assert rc == 0
        rows = [json.loads(l)
                for l in capsys.readouterr().out.strip().splitlines()]
        assert [r["id"] for r in rows] == [0, 1, 2]
        per_engine[engine] = rows
    # both engines produce identical results for identical requests
    for a, b in zip(per_engine["batched"], per_engine["continuous"]):
        assert a["text"] == b["text"]
        assert a["num_gen_imgs"] == b["num_gen_imgs"]
