"""Executable eval entry points mirroring the reference's 7 inference scripts.

  python -m seedx_tpu.inference.eval_cli img2text   --image X --question Q
      <- src/inference/eval_img2text_seed_x_i.py (instruct)
         / eval_img2text_seed_x.py (--prompt_style pretrain)
  python -m seedx_tpu.inference.eval_cli ground     --image X --question Q
      <- detection half of eval_img2text_seed_x_i.py
  python -m seedx_tpu.inference.eval_cli text2img   --caption C
      <- eval_text2img_seed_x_i.py / eval_text2img_seed_x.py
  python -m seedx_tpu.inference.eval_cli edit       --image X --instruction I
      <- eval_img2edit_seed_x_edit.py
  python -m seedx_tpu.inference.eval_cli detokenize --image X [--condition Y]
      <- eval_seed_x_detokenizer.py / eval_seed_x_detokenizer_with_condition.py
  python -m seedx_tpu.inference.eval_cli chat
      multi-turn interleaved REPL (no reference script; format of
      src/data/sft_clm.py).  Each stdin line is one user turn; prefix
      "img:PATH<space>" attaches an image; "exit" quits.
  python -m seedx_tpu.inference.eval_cli serve --requests reqs.jsonl
      batch server driver: JSONL in ({kind: comprehend|t2i|edit|raw, ...},
      optional per-request max_new_tokens), JSONL results out.
      --engine batched (bucket micro-batching) | continuous (slot pool,
      rolling admission).
  python -m seedx_tpu.inference.server --port 8000
      HTTP front-end (JSON over POST, micro-batching dispatcher, chat
      sessions) — see inference/server.py.

``--debug`` (or env SEEDX_DEBUG=1) runs the tiny random stack so every flow
executes without the released 17B weights (the reference DEBUG_FLAG analogue).
"""

from __future__ import annotations

import argparse
import os
import sys


def _save_images(images, out_dir: str, stem: str):
    import numpy as np
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, img in enumerate(np.asarray(images)):
        arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        path = os.path.join(out_dir, f"{stem}_{i}.png")
        Image.fromarray(arr).save(path)
        paths.append(path)
    return paths


def _load_runtime(args):
    from seedx_tpu.inference.runtime import SeedXRuntime

    if args.debug or os.environ.get("SEEDX_DEBUG") in ("1", "True"):
        return SeedXRuntime.debug(with_adapter=True)
    if getattr(args, "ckpt_root", None):
        return SeedXRuntime.from_pretrained(
            root=args.ckpt_root, model=args.model,
            quantization=getattr(args, "quantization", "none"))
    raise SystemExit(
        "non-debug runtime requires the release checkpoints: pass "
        "--ckpt_root pretrained (reference README.md:74-87 layout) for "
        "real weights, or --debug / SEEDX_DEBUG=1 for the tiny random "
        "stack; power users can also assemble SeedXRuntime directly from "
        "seedx_tpu.models.factory builders")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("command", choices=["img2text", "ground", "text2img",
                                       "edit", "detokenize", "chat", "serve"])
    p.add_argument("--requests",
                   help="serve: JSONL file of requests (default stdin); "
                        "each line {kind: comprehend|t2i|edit|raw, ...}")
    p.add_argument("--engine", default="batched",
                   choices=["batched", "continuous"],
                   help="serve: bucket-batched ServingEngine or "
                        "slot-pool ContinuousEngine")
    p.add_argument("--max_batch_size", type=int, default=8)
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--paged", action="store_true",
                   help="serve --engine continuous: paged KV (shared tile "
                        "pool + block tables; needs an int4 runtime)")
    p.add_argument("--pool_tokens", type=int, default=0,
                   help="paged KV pool size in tokens (default: the dense "
                        "footprint, slots x (max bucket + max_new_tokens))")
    p.add_argument("--image")
    p.add_argument("--condition")
    p.add_argument("--question", default="What is in this image?")
    p.add_argument("--caption", default="a red car on a beach")
    p.add_argument("--instruction", default="make it a sunset")
    p.add_argument("--prompt_style", default="instruct",
                   choices=["instruct", "pretrain"])
    p.add_argument("--max_new_tokens", type=int, default=512)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--solver", default="euler",
                   choices=["euler", "dpmpp_2m", "dpmpp_3m"],
                   help="diffusion sampler: euler = reference parity; "
                        "dpmpp_2m = DPM-Solver++(2M) Karras (~15 steps "
                        "match euler's 50-step quality)")
    p.add_argument("--spec_k", type=int, default=0,
                   help="n-gram speculative decoding draft length (greedy "
                        "B=1 only; 0 disables) — exact same tokens, fewer "
                        "weight passes on self-similar replies")
    p.add_argument("--image_cfg", type=float, default=None,
                   help="edit: image_guidance_scale (default = config's "
                        "1.5, the reference pipeline default; exactly 1.0 "
                        "collapses the uncond CFG branch algebraically -> "
                        "x2 UNet batch per step, ~1/3 less denoise compute)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out_dir", default="vis")
    p.add_argument("--score_against", metavar="PATH",
                   help="text2img/edit/detokenize: score the first "
                        "generated image against this reference image "
                        "(SSIM/PSNR/MSE always; LPIPS when perceptual "
                        "weights are present) — the quantitative version "
                        "of the reference's golden-demo QA "
                        "(vis/men_recon.jpg etc.); BASELINE.md pins "
                        "recon LPIPS <= 0.05")
    p.add_argument("--ckpt_root", metavar="DIR",
                   help="release checkpoint root (the reference README's "
                        "./pretrained layout) — builds the REAL-weight "
                        "runtime via SeedXRuntime.from_pretrained with "
                        "manifest validation; see --model")
    p.add_argument("--model", default="seed_x_i",
                   choices=["seed_x", "seed_x_i", "seed_x_edit"],
                   help="which released model under --ckpt_root")
    p.add_argument("--quantization", default="none",
                   choices=["none", "int8", "int4"],
                   help="--ckpt_root: LLM weight quantization (int4 = the "
                        "benchmarked single-chip serving config)")
    p.add_argument("--debug", action="store_true")
    args = p.parse_args(argv)

    from PIL import Image

    from seedx_tpu.inference import apps

    rt = _load_runtime(args)
    image = Image.open(args.image).convert("RGB") if args.image else None

    def score(images):
        """--score_against: print fidelity metrics for the first image."""
        if not args.score_against or images is None or len(images) == 0:
            return
        import json as _json

        import numpy as _np

        from seedx_tpu.utils.image_metrics import score_images

        ref = Image.open(args.score_against).convert("RGB")
        print("fidelity:",
              _json.dumps(score_images(ref, _np.asarray(images)[0])))

    if args.command == "img2text":
        out = apps.comprehend(rt, image, args.question,
                              prompt_style=args.prompt_style,
                              max_new_tokens=args.max_new_tokens,
                              spec_k=args.spec_k)
        print(out["clean_text"])
    elif args.command == "ground":
        out = apps.ground(rt, image, args.question,
                          max_new_tokens=args.max_new_tokens,
                          spec_k=args.spec_k)
        print(out["clean_text"])
        print("boxes:", out.get("boxes_pixels"))
        if out["boxes_image"] is not None:
            # reference: eval_img2text_seed_x_i.py:228-231 (vis/ground.png)
            os.makedirs(args.out_dir, exist_ok=True)
            path = os.path.join(args.out_dir, "ground.png")
            out["boxes_image"].save(path)
            print("saved:", path)
    elif args.command == "text2img":
        out = apps.text_to_image(rt, args.caption, seed=args.seed,
                                 num_inference_steps=args.num_inference_steps,
                                 solver=args.solver, spec_k=args.spec_k)
        print(out["text"])
        if out["images"] is not None:
            print("saved:", _save_images(out["images"], args.out_dir, "t2i"))
            score(out["images"])
        else:
            print("(no image span generated)")
    elif args.command == "edit":
        out = apps.edit_image(rt, image, args.instruction, seed=args.seed,
                              num_inference_steps=args.num_inference_steps,
                              solver=args.solver, spec_k=args.spec_k,
                              image_guidance_scale=args.image_cfg)
        print(out["text"])
        if out["images"] is not None:
            print("saved:", _save_images(out["images"], args.out_dir, "edit"))
            score(out["images"])
        else:
            print("(no image span generated)")
    elif args.command == "chat":
        from seedx_tpu.inference.chat import ChatSession

        session = ChatSession(rt)
        n_img = 0
        print("chat ready — 'img:PATH text' attaches an image, 'exit' quits")
        for line in sys.stdin:
            line = line.strip()
            if not line:
                continue
            if line in ("exit", "quit"):
                break
            turn_image = None
            if line.startswith("img:"):
                path, _, line = line[4:].partition(" ")
                turn_image = Image.open(path).convert("RGB")
            out = session.send(line, image=turn_image,
                               max_new_tokens=args.max_new_tokens,
                               num_inference_steps=args.num_inference_steps,
                               seed=args.seed, spec_k=args.spec_k)
            print(out["text"])
            if out["images"] is not None:
                n_img += len(out["images"])
                print("saved:", _save_images(out["images"], args.out_dir,
                                             f"chat_{n_img}"))
    elif args.command == "serve":
        import json

        lines = (open(args.requests) if args.requests else sys.stdin)
        reqs = [json.loads(ln) for ln in lines if ln.strip()]

        def emit(i, res):
            paths = None
            if res.get("images") is not None:
                paths = _save_images(res["images"], args.out_dir,
                                     f"serve_{i}")
            print(json.dumps({
                "id": i, "text": res.get("clean_text", res.get("text", "")),
                "num_gen_imgs": int(res.get("num_gen_imgs", 0)),
                "images": paths}))

        if args.engine == "batched":
            from seedx_tpu.inference.serving import ServingEngine

            eng = ServingEngine(rt, max_batch_size=args.max_batch_size,
                                max_new_tokens=args.max_new_tokens,
                                num_inference_steps=args.num_inference_steps,
                                seed=args.seed,
                                image_guidance_scale=args.image_cfg)
            for r in reqs:
                kind = r.get("kind", "raw")
                if kind == "comprehend":
                    eng.submit_comprehend(
                        Image.open(r["image"]).convert("RGB"), r["question"])
                elif kind == "t2i":
                    eng.submit_text_to_image(r["caption"])
                elif kind == "edit":
                    eng.submit_edit(Image.open(r["image"]).convert("RGB"),
                                    r["instruction"])
                else:
                    ids = r.get("input_ids") or (
                        [rt.tokenizer.bos_token_id]
                        + rt.tokenizer.encode(r["text"]))
                    eng.submit_raw({"input_ids": ids})
            for i, res in enumerate(eng.flush()):
                emit(i, res)
        else:
            from seedx_tpu.inference.apps import _prepare_image_prompt
            from seedx_tpu.inference.continuous import ContinuousEngine
            from seedx_tpu.text import prompts as P

            eng = ContinuousEngine(rt, slots=args.slots,
                                   max_new_tokens=args.max_new_tokens,
                                   paged=args.paged,
                                   pool_tokens=args.pool_tokens)
            order = []
            edit_sources = {}
            for i, r in enumerate(reqs):
                kind = r.get("kind", "raw")
                if kind in ("comprehend", "edit"):
                    src = Image.open(r["image"]).convert("RGB")
                    ids, cm, emb, ecm, pp = _prepare_image_prompt(
                        rt, src, r["question" if kind == "comprehend"
                                   else "instruction"])
                    req = {"input_ids": ids, "image_embeds": emb,
                           "embeds_cmp_mask": ecm, "ids_cmp_mask": cm,
                           "patch_positions": pp}
                    if kind == "edit":
                        edit_sources[i] = src
                elif kind == "t2i":
                    text = P.generation_prompt(r["caption"])
                    req = {"input_ids": [rt.tokenizer.bos_token_id]
                           + rt.tokenizer.encode(text)}
                else:
                    req = {"input_ids": r.get("input_ids") or (
                        [rt.tokenizer.bos_token_id]
                        + rt.tokenizer.encode(r["text"]))}
                order.append(eng.submit(
                    req, max_new_tokens=r.get("max_new_tokens")))
            results = eng.run()
            for i, rid in enumerate(order):
                res = results[rid]
                if (res["has_img_output"] and rt.adapter is not None
                        and res["img_gen_feat"] is not None):
                    latent_image = None
                    if i in edit_sources:          # edit: condition latents
                        import jax.numpy as jnp

                        from seedx_tpu.data.transforms import get_transform

                        tf = get_transform(
                            "sd", keep_ratio=False,
                            image_size=rt.adapter.cfg.sampler.height)
                        latent_image = jnp.asarray(tf(edit_sources[i]))[None]
                        n_spans = res["img_gen_feat"].shape[0]
                        if n_spans > 1:   # one condition per generated span
                            latent_image = jnp.repeat(latent_image, n_spans,
                                                      axis=0)
                    res["images"] = rt.adapter.generate(
                        res["img_gen_feat"], latent_image=latent_image,
                        seed=args.seed,
                        num_inference_steps=args.num_inference_steps,
                        solver=args.solver,
                        image_guidance_scale=(args.image_cfg
                                              if i in edit_sources else None))
                res["clean_text"] = P.strip_markup(res["text"])
                emit(i, res)
    elif args.command == "detokenize":
        if args.condition:
            cond = Image.open(args.condition).convert("RGB")
            imgs = apps.reconstruct_with_condition(
                rt, image, cond, seed=args.seed,
                num_inference_steps=args.num_inference_steps,
                solver=args.solver)
        else:
            imgs = apps.reconstruct(
                rt, image, seed=args.seed,
                num_inference_steps=args.num_inference_steps,
                solver=args.solver)
        print("saved:", _save_images(imgs, args.out_dir, "recon"))
        score(imgs)
    return 0


if __name__ == "__main__":
    sys.exit(main())
