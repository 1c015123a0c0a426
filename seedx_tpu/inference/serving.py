"""Bucket-batched serving engine.

The reference serves one prompt at a time through the HF ``generate`` loop
(reference: src/inference/eval_img2text_seed_x_i.py — a bare for-loop over
samples).  TPU decode is HBM-bandwidth-bound: streaming the (int8) 13B
weights through the MXU costs the same at batch 1 and batch 8, so batching
multiplies tokens/sec/chip near-linearly until the MXU saturates.  The
engine:

  * queues heterogeneous requests (comprehension, t2i, edit, raw),
  * groups them by prompt-length bucket (static shapes -> one compile per
    (bucket, max_new_tokens) pair, reused forever),
  * runs ONE jitted prefill+decode per group (``generate_batch``),
  * batches the SDXL adapter over ALL generated image spans of a group —
    the UNet denoise loop runs once per (kind) group, not once per request.

Synchronous by design: JAX dispatch is async already, and the one-TPU-process
rule makes an in-process queue the right shape; an RPC front-end can wrap
``submit*``/``flush`` without changes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from seedx_tpu.inference.apps import _prepare_image_prompt
from seedx_tpu.inference.runtime import SeedXRuntime
from seedx_tpu.models.generation import GenerationConfig
from seedx_tpu.text import prompts


@dataclasses.dataclass
class _Pending:
    idx: int                      # submission order
    request: Dict[str, Any]      # generate_batch schema
    kind: str                    # "comprehend" | "t2i" | "edit" | "raw"
    image: Any = None            # source PIL image (edit condition path)


class ServingEngine:
    """In-process micro-batching server over a SeedXRuntime."""

    def __init__(self, rt: SeedXRuntime, max_batch_size: int = 8,
                 max_new_tokens: int = 512, num_inference_steps: int = 50,
                 seed: int = 42, tile_buckets: Optional[Any] = None,
                 image_guidance_scale: Optional[float] = None):
        self.rt = rt
        self.max_batch_size = max_batch_size
        self.max_new_tokens = max_new_tokens
        self.num_inference_steps = num_inference_steps
        self.seed = seed
        # edit-request CFG: None = adapter config default (1.5, reference
        # parity); exactly 1.0 selects denoise_edit's 2-branch collapse
        self.image_guidance_scale = image_guidance_scale
        # bound distinct compiled ViT programs across anyres tile counts
        # (runtime.encode_image_anyres pads to the next bucket) — passed as
        # an explicit argument through THIS engine's image prep, so a shared
        # runtime is never mutated (and concurrent submit_* calls can't race
        # on it)
        self.tile_buckets = tuple(tile_buckets) if tile_buckets else None
        self._pending: List[_Pending] = []
        self._count = 0

    # ---- submission --------------------------------------------------------

    def _push(self, request: Dict[str, Any], kind: str, image=None) -> int:
        idx = self._count
        self._count += 1
        self._pending.append(_Pending(idx, request, kind, image))
        return idx

    def submit_comprehend(self, image, question: str,
                          prompt_style: str = "instruct") -> int:
        ids, cmp_mask, embeds, ecm, ppos = _prepare_image_prompt(
            self.rt, image, question, prompt_style,
            tile_buckets=self.tile_buckets)
        return self._push({"input_ids": ids, "image_embeds": embeds,
                           "embeds_cmp_mask": ecm, "ids_cmp_mask": cmp_mask,
                           "patch_positions": ppos}, "comprehend")

    def submit_text_to_image(self, caption: str) -> int:
        text = prompts.generation_prompt(caption)
        ids = [self.rt.tokenizer.bos_token_id] + self.rt.tokenizer.encode(text)
        return self._push({"input_ids": ids}, "t2i")

    def submit_edit(self, image, instruction: str) -> int:
        ids, cmp_mask, embeds, ecm, ppos = _prepare_image_prompt(
            self.rt, image, instruction, tile_buckets=self.tile_buckets)
        return self._push({"input_ids": ids, "image_embeds": embeds,
                           "embeds_cmp_mask": ecm, "ids_cmp_mask": cmp_mask,
                           "patch_positions": ppos}, "edit", image=image)

    def submit_raw(self, request: Dict[str, Any]) -> int:
        """A pre-built generate_batch request dict."""
        return self._push(request, "raw")

    # ---- execution ---------------------------------------------------------

    def _bucket_of(self, n: int, gen_cfg: GenerationConfig) -> int:
        return next((x for x in gen_cfg.prompt_buckets if x >= n), n)

    def flush(self) -> List[Dict[str, Any]]:
        """Run everything queued; returns results in submission order."""
        gen_cfg = GenerationConfig(
            max_new_tokens=self.max_new_tokens,
            num_img_gen_tokens=self.rt.agent_cfg.num_img_out_tokens,
            eos_token_id=self.rt.tokenizer.eos_token_id,
            pad_token_id=self.rt.tokenizer.pad_token_id)

        groups: Dict[int, List[_Pending]] = {}
        for p in self._pending:
            groups.setdefault(
                self._bucket_of(len(p.request["input_ids"]), gen_cfg),
                []).append(p)
        self._pending = []

        results: Dict[int, Dict[str, Any]] = {}
        from seedx_tpu.models.generation import generate_batch

        for bucket in sorted(groups):
            batch = groups[bucket]
            for i in range(0, len(batch), self.max_batch_size):
                chunk = batch[i:i + self.max_batch_size]
                outs = generate_batch(
                    self.rt.agent, {"params": self.rt.agent_params},
                    self.rt.tokenizer, [p.request for p in chunk],
                    gen_cfg=gen_cfg)
                for p, out in zip(chunk, outs):
                    out["clean_text"] = prompts.strip_markup(out["text"])
                    out["images"] = None
                    results[p.idx] = out
                self._decode_images(chunk, outs, results)

        return [results[i] for i in sorted(results)]

    def _decode_images(self, chunk: List[_Pending], outs: List[Dict],
                       results: Dict[int, Dict]) -> None:
        """ONE batched SDXL run per kind for every image span in the chunk."""
        if self.rt.adapter is None:
            return

        # t2i spans: plain 2-way-CFG pipeline, all spans in one denoise.
        feats, owners = [], []
        for p, out in zip(chunk, outs):
            if p.kind in ("t2i", "comprehend", "raw") and out["has_img_output"]:
                feats.append(out["img_gen_feat"])
                owners.extend([p.idx] * out["num_gen_imgs"])
        if feats:
            images = self.rt.adapter.generate(
                jnp.concatenate(feats), seed=self.seed,
                num_inference_steps=self.num_inference_steps)
            for owner, img in zip(owners, images):
                prev = results[owner]["images"]
                results[owner]["images"] = (
                    img[None] if prev is None
                    else np.concatenate([prev, img[None]]))

        # edit spans: 3-way CFG with per-request condition latents.
        feats, owners, latents = [], [], []
        for p, out in zip(chunk, outs):
            if p.kind == "edit" and out["has_img_output"]:
                from seedx_tpu.data.transforms import get_transform

                sampler = self.rt.adapter.cfg.sampler
                tf = get_transform("sd", keep_ratio=False,
                                   image_size=sampler.height)
                lat = jnp.asarray(tf(p.image))[None]
                feats.append(out["img_gen_feat"])
                owners.extend([p.idx] * out["num_gen_imgs"])
                latents.append(jnp.repeat(lat, out["num_gen_imgs"], axis=0))
        if feats:
            images = self.rt.adapter.generate(
                jnp.concatenate(feats),
                latent_image=jnp.concatenate(latents), seed=self.seed,
                num_inference_steps=self.num_inference_steps,
                image_guidance_scale=self.image_guidance_scale)
            for owner, img in zip(owners, images):
                prev = results[owner]["images"]
                results[owner]["images"] = (
                    img[None] if prev is None
                    else np.concatenate([prev, img[None]]))
