"""Data-layer tests: encoders, streaming readers, builders, and an
end-to-end [synthetic shards -> batches -> train step] integration."""

import io
import json
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from seedx_tpu.data import encoding
from seedx_tpu.data.datasets import (build_caption_datapipes_with_pixels,
                                     build_llava_jsonl_datapipes,
                                     build_multi_datapipes,
                                     build_single_turn_edit_datapipes)
from seedx_tpu.data.pipeline import (ThreadPrefetcher, collate_anyres,
                                     read_jsonl, read_tar_shards,
                                     shuffle_stream, weighted_mix)
from seedx_tpu.data.transforms import get_transform
from seedx_tpu.text.tokenizer import ByteFallbackTokenizer
from seedx_tpu.text.vocab import DEFAULT_VOCAB

TOK = ByteFallbackTokenizer()
V = DEFAULT_VOCAB


# --------------------------------------------------------------------------
# encoders
# --------------------------------------------------------------------------

def test_encode_caption_img_first():
    rng = np.random.default_rng(0)
    out = encoding.encode_caption_sample(
        "a cat", TOK, max_length=256, img_first_ratio=1.0, patch_length=2,
        rng=rng)
    ids = out["input_ids"]
    # 2 spans: one <patch>, one <img>
    assert (ids == V.bop).sum() == 1
    assert (ids == V.boi).sum() == 1
    assert out["ids_cmp_mask"].sum() == 2 * 64
    assert out["ids_gen_mask"].sum() == 0
    assert list(out["embeds_cmp_mask"]) == [True, True]
    # caption is supervised, image tokens are not
    assert (out["labels"] != -100).sum() > 0
    cmp_positions = np.where(out["ids_cmp_mask"])[0]
    assert (out["labels"][cmp_positions] == -100).all()


def test_encode_caption_img_last_gen():
    rng = np.random.default_rng(0)
    out = encoding.encode_caption_sample(
        "a cat", TOK, max_length=256, img_first_ratio=0.0, patch_length=2,
        rng=rng)
    assert out["ids_gen_mask"].sum() == 64
    assert out["ids_cmp_mask"].sum() == 0
    assert list(out["embeds_gen_mask"]) == [False, True]
    # the <img> opener itself is supervised (model learns to emit it)
    boi_pos = int(np.where(out["input_ids"] == V.boi)[0][0])
    assert out["labels"][boi_pos] == V.boi


def test_encode_caption_overflow_forces_img_first():
    rng = np.random.default_rng(0)
    out = encoding.encode_caption_sample(
        "x" * 200, TOK, max_length=140, img_first_ratio=0.0, patch_length=1,
        rng=rng)
    assert out["ids_gen_mask"].sum() == 0  # fell back to comprehension
    assert out["input_ids"].shape == (140,)


def test_encode_conversation_labels_on_assistant_only():
    turns = ["what is this?", "a dog", "sure?", "yes"]
    out = encoding.encode_conversation_sample(
        turns, TOK, max_length=256, patch_length=2, rng=np.random.default_rng(0))
    assert out is not None
    assert out["ids_cmp_mask"].sum() == 2 * 64
    # assistant bytes are supervised
    sup = (out["labels"] != -100).sum()
    assert sup >= len("a dog") + len("yes")
    # user-turn tokens are not
    user_ids = TOK.encode("what is this?")
    # at least verify no supervision before the first assistant turn starts
    first_sup = int(np.where(out["labels"] != -100)[0][0])
    assert first_sup > len(user_ids)


def test_encode_conversation_truncated_image_dropped():
    out = encoding.encode_conversation_sample(
        ["q", "a"], TOK, max_length=64, patch_length=2,
        rng=np.random.default_rng(0))
    assert out is None  # image span beyond max_length -> sample dropped


def test_encode_edit_sample_masks():
    out = encoding.encode_edit_sample(
        "make it red", TOK, max_length=384, source_patch_length=2,
        target_patch_length=2, rng=np.random.default_rng(0))
    assert out["ids_cmp_mask"].sum() == 2 * 64
    assert out["ids_gen_mask"].sum() == 64
    assert list(out["embeds_cmp_mask"]) == [True, True, False, False]
    assert list(out["embeds_gen_mask"]) == [False, False, False, True]


# --------------------------------------------------------------------------
# streaming primitives
# --------------------------------------------------------------------------

def _write_tar(path, n, size=(500, 460)):
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            img = Image.fromarray(
                (np.random.RandomState(i).rand(size[1], size[0], 3) * 255
                 ).astype(np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{i:05d}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            txt = f"caption number {i}".encode()
            info = tarfile.TarInfo(f"{i:05d}.txt")
            info.size = len(txt)
            tf.addfile(info, io.BytesIO(txt))
            meta = json.dumps({"similarity": 0.9}).encode()
            info = tarfile.TarInfo(f"{i:05d}.json")
            info.size = len(meta)
            tf.addfile(info, io.BytesIO(meta))


def test_read_tar_shards(tmp_path):
    p = str(tmp_path / "shard.tar")
    _write_tar(p, 3)
    samples = list(read_tar_shards(p))
    assert len(samples) == 3
    assert samples[0]["text"] == "caption number 0"
    assert samples[0]["images"].size == (500, 460)
    assert json.loads(samples[0]["metadata"])["similarity"] == 0.9


def test_read_tar_corrupt_is_skipped(tmp_path):
    p = str(tmp_path / "bad.tar")
    with open(p, "wb") as f:
        f.write(b"this is not a tar file at all")
    assert list(read_tar_shards(p)) == []


def test_read_jsonl_skips_bad_lines(tmp_path):
    p = str(tmp_path / "data.jsonl")
    with open(p, "w") as f:
        f.write('{"a": 1}\nnot json\n{"a": 2}\n')
    assert [x["a"] for x in read_jsonl(p)] == [1, 2]


def test_weighted_mix_and_shuffle():
    a = iter([{"s": "a"}] * 10)
    b = iter([{"s": "b"}] * 10)
    out = list(weighted_mix([a, b], [0.9, 0.1], seed=0))
    assert len(out) == 20  # drains both
    shuffled = list(shuffle_stream(iter(range(50)), buffer_size=8, seed=0))
    assert sorted(shuffled) == list(range(50))
    assert shuffled != list(range(50))


def test_thread_prefetcher_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")

    pf = ThreadPrefetcher(gen())
    assert next(pf) == 1
    with pytest.raises(RuntimeError):
        next(pf)


def test_collate_anyres_static_shapes():
    def sample(n_img):
        return {
            "input_ids": np.zeros(16, np.int32),
            "attention_mask": np.ones(16, np.int32),
            "labels": np.zeros(16, np.int32),
            "ids_gen_mask": np.zeros(16, bool),
            "ids_cmp_mask": np.zeros(16, bool),
            "images": np.ones((n_img, 8, 8, 3), np.float32),
            "patch_positions": np.full((n_img, 2), 0.5, np.float32),
            "embeds_gen_mask": np.zeros(n_img, bool),
            "embeds_cmp_mask": np.ones(n_img, bool),
        }

    batch = collate_anyres([sample(2), sample(1)], max_images=6, image_size=8)
    assert batch["images"].shape == (6, 8, 8, 3)
    assert batch["embeds_cmp_mask"].tolist() == [True] * 3 + [False] * 3
    assert batch["input_ids"].shape == (2, 16)
    # overflow raises
    with pytest.raises(ValueError):
        collate_anyres([sample(4), sample(4)], max_images=6, image_size=8)


# --------------------------------------------------------------------------
# builders end-to-end
# --------------------------------------------------------------------------

@pytest.fixture()
def caption_shards(tmp_path):
    d = tmp_path / "tars"
    d.mkdir()
    _write_tar(str(d / "s0.tar"), 6)
    _write_tar(str(d / "s1.tar"), 6)
    return str(d)


def test_build_caption_pipeline(caption_shards):
    transform = get_transform("clip", keep_ratio=False, image_size=56)
    it = build_caption_datapipes_with_pixels(
        caption_shards, tokenizer=TOK, image_transform=transform,
        max_length=200, batch_size=2, cycle_count=1,
        resolution_grids=["1x1"], base_resolution=56, min_resolution=100)
    batches = list(it)
    assert len(batches) >= 2
    b = batches[0]
    assert b["input_ids"].shape == (2, 200)
    assert b["images"].shape == (4, 56, 56, 3)   # 2 samples x (1 tile + thumb)
    assert b["embeds_cmp_mask"].shape == (4,)


def test_build_llava_pipeline(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray((np.random.rand(500, 460, 3) * 255).astype(np.uint8)
                    ).save(img_dir / "a.jpg")
    jl = tmp_path / "conv.jsonl"
    with open(jl, "w") as f:
        for i in range(4):
            f.write(json.dumps({
                "image": "a.jpg",
                "data": ["what is this?", f"answer {i}"],
            }) + "\n")
    transform = get_transform("clip", keep_ratio=False, image_size=56)
    it = build_llava_jsonl_datapipes(
        str(jl), str(img_dir), tokenizer=TOK, image_transform=transform,
        max_length=300, batch_size=2, cycle_count=1,
        resolution_grids=["1x1"], base_resolution=56, min_resolution=10)
    batches = list(it)
    assert len(batches) == 2
    assert batches[0]["images"].shape[0] == 4


def test_build_edit_pipeline(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for name in ("src.jpg", "tgt.jpg"):
        Image.fromarray((np.random.rand(500, 460, 3) * 255).astype(np.uint8)
                        ).save(img_dir / name)
    jl = tmp_path / "edit.jsonl"
    with open(jl, "w") as f:
        for i in range(4):
            f.write(json.dumps({
                "source_image": "src.jpg", "target_image": "tgt.jpg",
                "instruction": f"edit {i}",
            }) + "\n")
    transform = get_transform("clip", keep_ratio=False, image_size=56)
    it = build_single_turn_edit_datapipes(
        str(jl), str(img_dir), tokenizer=TOK, image_transform=transform,
        max_length=384, batch_size=2, cycle_count=1,
        resolution_grids=["1x1"], base_resolution=56, min_resolution=10)
    b = next(it)
    assert b["images"].shape[0] == 8          # 2 samples x 2 imgs x 2 tiles
    assert b["embeds_gen_mask"].sum() == 2


def test_build_multi_datapipes_config(caption_shards):
    cfg = {
        "_target_": "seedx_tpu.data.datasets.build_multi_datapipes",
        "_recursive_": False,
        "datapipes": [{
            "_target_":
                "seedx_tpu.data.datasets.build_caption_datapipes_with_pixels",
            "data_dir": caption_shards,
            "max_length": 200, "batch_size": 2, "cycle_count": 1,
            "resolution_grids": ["1x1"], "base_resolution": 56,
            "min_resolution": 100,
        }],
        "sample_weights": [1.0],
    }
    from seedx_tpu.config import instantiate

    transform = get_transform("clip", keep_ratio=False, image_size=56)
    it = instantiate(cfg, tokenizer=TOK, image_transform=transform)
    b = next(iter(it))
    assert b["input_ids"].shape == (2, 200)
