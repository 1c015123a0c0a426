"""HTTP serving front-end (seedx_tpu/inference/server.py): endpoints,
micro-batching dispatcher, chat sessions, error paths — driven over real
HTTP against the tiny debug stack."""

import base64
import io
import json
import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest
from PIL import Image

from seedx_tpu.inference.runtime import SeedXRuntime
from seedx_tpu.inference.server import SeedXServer


@pytest.fixture(scope="module")
def served():
    rt = SeedXRuntime.debug(with_adapter=True)
    server = SeedXServer(rt, max_new_tokens=4, num_inference_steps=2,
                         request_timeout=300.0)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), server.make_handler())
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield server, f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()
    server.shutdown()


def _post(url, path, payload):
    req = urllib.request.Request(
        url + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


def _get(url, path):
    with urllib.request.urlopen(url + path, timeout=30) as r:
        return json.loads(r.read())


def _image_b64():
    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 255, (72, 56, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def test_healthz_and_stats(served):
    _, url = served
    assert _get(url, "/healthz") == {"ok": True}
    stats = _get(url, "/v1/stats")
    assert {"served", "errors", "queued", "chat_sessions"} <= stats.keys()


def test_comprehend_with_and_without_image(served):
    _, url = served
    out = _post(url, "/v1/comprehend",
                {"image": _image_b64(), "question": "What is this?"})
    assert isinstance(out["text"], str)
    out2 = _post(url, "/v1/comprehend", {"question": "Hello?"})
    assert isinstance(out2["text"], str)


def test_generate_returns_png(served):
    _, url = served
    out = _post(url, "/v1/generate", {"caption": "a red car"})
    # debug weights rarely emit an image span; the contract is the schema
    assert "images" in out and "has_img_output" in out
    if out["images"]:
        png = base64.b64decode(out["images"][0])
        img = Image.open(io.BytesIO(png))
        assert img.size[0] > 0


def test_concurrent_requests_micro_batch(served):
    server, url = served
    results = {}

    def hit(i):
        results[i] = _post(url, "/v1/comprehend",
                           {"question": f"Question {i}?"})

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 3
    assert all(isinstance(r["text"], str) for r in results.values())
    assert server.stats()["served"] >= 3


def test_chat_session_persists(served):
    server, url = served
    out = _post(url, "/v1/chat", {"session": "s1", "message": "hi",
                                  "max_new_tokens": 4})
    assert out["session"] == "s1"
    _post(url, "/v1/chat", {"session": "s1", "message": "again",
                            "max_new_tokens": 4})
    assert server.stats()["chat_sessions"] == 1


def test_bad_requests_fail_without_killing_server(served):
    _, url = served
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url, "/v1/edit", {"instruction": "no image supplied"})
    assert e.value.code in (400, 500)
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url, "/v1/nope", {})
    assert e.value.code == 404
    # server still healthy afterwards
    assert _get(url, "/healthz") == {"ok": True}
    out = _post(url, "/v1/raw", {"input_ids": [1, 2, 3]})
    assert isinstance(out["text"], str)
