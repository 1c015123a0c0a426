"""Native C++ shard reader (seedx_tpu/data/native) vs the Python reader."""

import io
import json
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from seedx_tpu.data import native as native_io
from seedx_tpu.data.pipeline import read_tar_shards, read_tar_shards_multi

pytestmark = pytest.mark.skipif(not native_io.available(),
                                reason="no C++ toolchain")


def _make_shard(path, keys, long_name=False):
    rng = np.random.RandomState(hash(path) % 1000)
    with tarfile.open(path, "w") as tf:
        for k in keys:
            img = Image.fromarray(rng.randint(0, 255, (32, 24, 3), np.uint8))
            buf = io.BytesIO()
            img.save(buf, "PNG")
            name = k + ("x" * 120 if long_name else "")
            for ext, data in [(".png", buf.getvalue()),
                              (".txt", f"caption {k}".encode()),
                              (".json", json.dumps({"k": k}).encode())]:
                info = tarfile.TarInfo(name + ext)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))


def test_native_matches_python_reader(tmp_path):
    paths = []
    for s in range(3):
        p = str(tmp_path / f"shard{s}.tar")
        _make_shard(p, [f"s{s}k{i:03d}" for i in range(5)],
                    long_name=(s == 1))
        paths.append(p)

    py = [r for p in paths for r in read_tar_shards(p)]
    nat = list(native_io.read_tar_shards_native(paths, num_threads=3))
    assert len(nat) == len(py) == 15
    py_by_key = {r["__key__"]: r for r in py}
    for r in nat:
        ref = py_by_key[r["__key__"]]
        assert r["text"] == ref["text"]
        assert json.loads(r["metadata"]) == json.loads(ref["metadata"])
        assert r["images"].size == ref["images"].size
        assert np.array_equal(np.asarray(r["images"]),
                              np.asarray(ref["images"]))


def test_native_skips_corrupt_shard(tmp_path):
    good = str(tmp_path / "good.tar")
    bad = str(tmp_path / "bad.tar")
    _make_shard(good, ["a", "b"])
    with open(bad, "wb") as f:
        f.write(b"this is not a tar file" * 40)

    out = list(native_io.read_tar_shards_native([bad, good], num_threads=2))
    assert sorted(r["__key__"] for r in out) == ["a", "b"]


def test_truncated_member(tmp_path):
    p = str(tmp_path / "trunc.tar")
    _make_shard(p, ["a", "b", "c"])
    sz = os.path.getsize(p)
    with open(p, "r+b") as f:
        f.truncate(sz - 700)   # cut into the tail member
    out = list(native_io.read_tar_shards_native([p], num_threads=1))
    # leading complete samples still arrive
    assert {r["__key__"] for r in out} >= {"a"}


def test_multi_dispatcher_python_fallback(tmp_path):
    p = str(tmp_path / "one.tar")
    _make_shard(p, ["z1", "z2"])
    nat = list(read_tar_shards_multi([p], native=True))
    py = list(read_tar_shards_multi([p], native=False))
    assert [r["__key__"] for r in nat] == [r["__key__"] for r in py]
