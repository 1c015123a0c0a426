"""HTTP serving front-end for the SEED-X stack (stdlib-only).

The reference has no server — its serving story is per-request eval
scripts (reference: src/inference/eval_img2text_seed_x_i.py:160-231,
eval_text2img_seed_x_i.py:60-94, eval_img2edit_seed_x_edit.py:120-153).
This module is framework-added production surface: a JSON/HTTP API over
the micro-batching engines, so one resident model stack serves many
clients.

Endpoints (JSON bodies; images travel as base64 PNG/JPEG):

  GET  /healthz                   -> {"ok": true}
  GET  /v1/stats                  -> server + engine counters
  POST /v1/comprehend  {"image"?, "question", "prompt_style"?}
  POST /v1/ground      {"image", "question"}         (+ annotated image)
  POST /v1/generate    {"caption", "seed"?, "num_inference_steps"?}
  POST /v1/edit        {"image", "instruction", "seed"?, ...}
  POST /v1/chat        {"session", "message", "image"?, ...}
  POST /v1/raw         {"input_ids": [...]}           (pre-tokenized)

Threading model: JAX and the engines are NOT thread-safe, so a single
dispatcher thread owns every device call.  HTTP handler threads enqueue
jobs and block on a per-job event.  Everything queued at dispatch time
that the bucket-batched ``ServingEngine`` understands (comprehend / t2i /
edit / raw) is flushed as ONE batch — concurrent clients get micro-
batching for free; ground and chat jobs run individually between batches
(chat keeps per-session KV prefix state, see chat.py).
"""

from __future__ import annotations

import base64
import io
import json
import queue
import threading
from collections import OrderedDict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional

import numpy as np

__all__ = ["SeedXServer", "main"]

_BATCHABLE = {"comprehend", "generate", "edit", "raw"}


def _decode_image(b64: str):
    from PIL import Image

    return Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGB")


def _encode_images(images) -> Optional[List[str]]:
    """[N, H, W, 3] float 0-1 array -> list of base64 PNGs."""
    if images is None:
        return None
    from PIL import Image

    out = []
    for img in np.asarray(images):
        arr = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        out.append(base64.b64encode(buf.getvalue()).decode("ascii"))
    return out


class _Job:
    __slots__ = ("kind", "payload", "done", "result", "error", "status")

    def __init__(self, kind: str, payload: Dict[str, Any]):
        self.kind = kind
        self.payload = payload
        self.done = threading.Event()
        self.result: Optional[Dict[str, Any]] = None
        self.error: Optional[str] = None
        self.status = 200


class SeedXServer:
    """Dispatcher + HTTP plumbing around one ``SeedXRuntime``."""

    def __init__(self, rt, max_batch_size: int = 8,
                 max_new_tokens: int = 512, num_inference_steps: int = 30,
                 request_timeout: float = 600.0, max_sessions: int = 8):
        """max_sessions bounds live chat sessions (LRU eviction): each
        session owns a preallocated device KV prefix cache — on the real
        13B that is HBM-scale state, so unbounded sessions OOM the chip."""
        from seedx_tpu.inference.serving import ServingEngine

        self.rt = rt
        self.engine = ServingEngine(rt, max_batch_size=max_batch_size,
                                    max_new_tokens=max_new_tokens,
                                    num_inference_steps=num_inference_steps)
        self.request_timeout = request_timeout
        self._queue: "queue.Queue[Optional[_Job]]" = queue.Queue()
        self._sessions: "OrderedDict[str, Any]" = OrderedDict()
        self._max_sessions = max(1, max_sessions)
        self._served = 0
        self._errors = 0
        self._lock = threading.Lock()
        self._dispatcher = threading.Thread(target=self._dispatch_loop,
                                            daemon=True)
        self._dispatcher.start()

    # ---- dispatcher (the only thread that touches the device) ----------

    def _dispatch_loop(self):
        while True:
            job = self._queue.get()
            if job is None:
                return
            batch = [job]
            while True:                      # opportunistic micro-batching
                try:
                    nxt = self._queue.get_nowait()
                except queue.Empty:
                    break
                if nxt is None:
                    self._queue.put(None)    # re-arm shutdown
                    break
                batch.append(nxt)
            batchable = [j for j in batch if j.kind in _BATCHABLE]
            singles = [j for j in batch if j.kind not in _BATCHABLE]
            if batchable:
                self._run_batch(batchable)
            for j in singles:
                self._run_single(j)

    def _finish(self, job: _Job, result=None, error=None, status=500):
        if error is not None:
            job.error, job.status = error, status
            with self._lock:
                self._errors += 1
        else:
            job.result = result
            with self._lock:
                self._served += 1
        job.done.set()

    def _run_batch(self, jobs: List[_Job]):
        eng = self.engine
        live: List[_Job] = []
        for j in jobs:
            p = j.payload
            try:
                if j.kind == "comprehend":
                    img = _decode_image(p["image"]) if p.get("image") else None
                    if img is not None:
                        eng.submit_comprehend(
                            img, p["question"],
                            prompt_style=p.get("prompt_style", "instruct"))
                    else:
                        from seedx_tpu.text import prompts

                        if p.get("prompt_style") == "pretrain":
                            text = prompts.PRETRAIN_QA_PROMPT.format(
                                question=p["question"])
                        else:
                            text = prompts.INSTRUCTION_PROMPT.format(
                                instruction=p["question"])
                        tok = self.rt.tokenizer
                        eng.submit_raw({"input_ids": [tok.bos_token_id]
                                        + tok.encode(text)})
                elif j.kind == "generate":
                    eng.submit_text_to_image(p["caption"])
                elif j.kind == "edit":
                    eng.submit_edit(_decode_image(p["image"]),
                                    p["instruction"])
                else:                        # raw
                    eng.submit_raw({"input_ids": list(p["input_ids"])})
                live.append(j)
            except Exception as e:  # bad request -> fail THIS job only
                self._finish(j, error=f"{type(e).__name__}: {e}", status=400)
        if not live:
            return
        try:
            results = eng.flush()
        except Exception as e:
            for j in live:
                self._finish(j, error=f"{type(e).__name__}: {e}")
            return
        # flush returns submission order == live order (engine was drained)
        for j, out in zip(live, results[-len(live):]):
            self._finish(j, result={
                "text": out.get("clean_text", out.get("text", "")),
                "images": _encode_images(out.get("images")),
                "has_img_output": bool(out.get("has_img_output")),
            })

    def _run_single(self, job: _Job):
        from seedx_tpu.inference import apps

        p = job.payload
        try:
            if job.kind == "ground":
                out = apps.ground(self.rt, _decode_image(p["image"]),
                                  p["question"],
                                  max_new_tokens=p.get("max_new_tokens", 512))
                boxes_img = None
                if out.get("boxes_image") is not None:
                    buf = io.BytesIO()
                    out["boxes_image"].save(buf, format="PNG")
                    boxes_img = base64.b64encode(buf.getvalue()
                                                 ).decode("ascii")
                self._finish(job, result={
                    "text": out["clean_text"],
                    "boxes_pixels": out.get("boxes_pixels"),
                    "boxes_image": boxes_img,
                })
            elif job.kind == "chat":
                from seedx_tpu.inference.chat import ChatSession

                sid = str(p["session"])
                sess = self._sessions.get(sid)
                if sess is None:
                    # LRU-evict before allocating: a session's KV prefix
                    # cache is device memory, never freed implicitly
                    while len(self._sessions) >= self._max_sessions:
                        self._sessions.popitem(last=False)
                    sess = self._sessions[sid] = ChatSession(self.rt)
                else:
                    self._sessions.move_to_end(sid)
                img = _decode_image(p["image"]) if p.get("image") else None
                out = sess.send(
                    p["message"], image=img,
                    max_new_tokens=p.get("max_new_tokens", 512),
                    num_inference_steps=p.get("num_inference_steps", 30),
                    seed=p.get("seed", 42),
                    spec_k=p.get("spec_k", 0))
                self._finish(job, result={
                    "session": sid,
                    "text": out["text"],
                    "images": _encode_images(out.get("images")),
                })
            else:
                self._finish(job, error=f"unknown kind {job.kind}",
                             status=400)
        except KeyError as e:
            self._finish(job, error=f"missing field {e}", status=400)
        except Exception as e:
            self._finish(job, error=f"{type(e).__name__}: {e}")

    # ---- public API ----------------------------------------------------

    def submit(self, kind: str, payload: Dict[str, Any]) -> _Job:
        job = _Job(kind, payload)
        self._queue.put(job)
        return job

    def stats(self) -> Dict[str, Any]:
        with self._lock:
            return {"served": self._served, "errors": self._errors,
                    "queued": self._queue.qsize(),
                    "chat_sessions": len(self._sessions)}

    def shutdown(self):
        self._queue.put(None)

    # ---- HTTP ----------------------------------------------------------

    def make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet by default
                pass

            def _reply(self, status: int, obj: Dict[str, Any]):
                body = json.dumps(obj).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._reply(200, {"ok": True})
                elif self.path == "/v1/stats":
                    self._reply(200, server.stats())
                else:
                    self._reply(404, {"error": "not found"})

            def do_POST(self):
                kinds = {"/v1/comprehend": "comprehend",
                         "/v1/ground": "ground",
                         "/v1/generate": "generate",
                         "/v1/edit": "edit",
                         "/v1/chat": "chat",
                         "/v1/raw": "raw"}
                kind = kinds.get(self.path)
                if kind is None:
                    return self._reply(404, {"error": "not found"})
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    payload = json.loads(self.rfile.read(n) or b"{}")
                except (ValueError, json.JSONDecodeError) as e:
                    return self._reply(400, {"error": f"bad json: {e}"})
                job = server.submit(kind, payload)
                if not job.done.wait(server.request_timeout):
                    return self._reply(504, {"error": "timeout"})
                if job.error is not None:
                    return self._reply(job.status, {"error": job.error})
                self._reply(200, job.result)

        return Handler

    def serve_forever(self, host: str = "127.0.0.1", port: int = 8000):
        httpd = ThreadingHTTPServer((host, port), self.make_handler())
        print(f"seedx_tpu server on http://{host}:{port}")
        try:
            httpd.serve_forever()
        finally:
            self.shutdown()


def main(argv=None):
    import argparse
    import os

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max_batch_size", type=int, default=8)
    p.add_argument("--max_new_tokens", type=int, default=512)
    p.add_argument("--num_inference_steps", type=int, default=30)
    p.add_argument("--debug", action="store_true",
                   help="tiny random debug stack (SEEDX_DEBUG)")
    args = p.parse_args(argv)

    from seedx_tpu.inference.runtime import SeedXRuntime

    if args.debug or os.environ.get("SEEDX_DEBUG") in ("1", "True"):
        rt = SeedXRuntime.debug(with_adapter=True)
    else:
        raise SystemExit(
            "non-debug runtime requires converted checkpoints; pass --debug "
            "or set SEEDX_DEBUG=1, or embed SeedXServer around a runtime "
            "built from seedx_tpu.models.factory")
    SeedXServer(rt, max_batch_size=args.max_batch_size,
                max_new_tokens=args.max_new_tokens,
                num_inference_steps=args.num_inference_steps
                ).serve_forever(args.host, args.port)


if __name__ == "__main__":
    main()
