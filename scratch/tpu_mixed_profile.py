"""Per-chunk cost profile of the fused continuous engine on the chip.

Times every ``engine.step()`` (one 32-step chunk) and labels it with how
many rows were mid-prefill, for fused on vs off — separating the mixed
(prefill+decode) program's cost from the legacy decode chunk's.  With
--trace, wraps two mid-run chunks in a jax.profiler trace for
scratch/parse_trace.py.

Usage:  python scratch/tpu_mixed_profile.py [--trace /tmp/mixtrace]
        [--width 8] [--layers 40]
"""
import argparse
import time
import types

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

import bench  # _fill_like
from seedx_tpu.inference.continuous import ContinuousEngine
from seedx_tpu.models.agent import AgentConfig, ContinuousLVLM
from seedx_tpu.models.llama import llama2_13b
from seedx_tpu.text.tokenizer import load_tokenizer


def build_rt(num_layers):
    llm_cfg = llama2_13b(quantization="int4", num_layers=num_layers,
                         kv_quantization="int8",
                         param_dtype=jnp.bfloat16, remat=False)
    agent_cfg = AgentConfig(llm=llm_cfg)
    model = ContinuousLVLM(agent_cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    attn = jnp.ones((1, 8), bool)
    img = jnp.zeros((1, 256, agent_cfg.vit_dim), jnp.bfloat16)
    fmask = jnp.zeros((1,), bool)
    idsm = jnp.zeros((1, 8), bool)
    shapes = nn.meta.unbox(jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), ids, attn,
                           jnp.where(attn, ids, -100), img, fmask, fmask,
                           idsm, idsm, jnp.full((1, 2), 0.5),
                           method="init_all"))["params"])
    params = bench._fill_like(shapes)
    return types.SimpleNamespace(agent=model, agent_params=params,
                                 agent_cfg=agent_cfg,
                                 tokenizer=load_tokenizer())


def run(rt, fused, width, trace_dir=None):
    rng = np.random.RandomState(0)
    eng = ContinuousEngine(rt, slots=8, max_new_tokens=128, chunk_steps=32,
                           prompt_buckets=(256,), fused_prefill=fused,
                           prefill_width=width)
    eng.warmup()
    for i in range(8):
        p = 120 + int(rng.randint(-16, 16))
        eng.submit({"input_ids": [1] + list(rng.randint(3, 30000, p)),
                    "image_embeds": None, "embeds_cmp_mask": None,
                    "ids_cmp_mask": None, "patch_positions": None},
                   max_new_tokens=128)
    rows = []
    n_chunk = 0
    while eng._pending or any(r is not None for r in eng._slot_req):
        pre = sum(1 for r in getattr(eng, "_prefill_remaining", [])
                  if r and r > 0) if fused else 0
        tracing = (trace_dir is not None and n_chunk == 1)
        if tracing:
            jax.profiler.start_trace(trace_dir)
        t0 = time.perf_counter()
        eng.step()
        dt = time.perf_counter() - t0
        if tracing:
            jax.profiler.stop_trace()
        rows.append((dt, pre))
        n_chunk += 1
        if n_chunk > 60:
            break
    label = f"fused w={width}" if fused else "legacy"
    mix = [d for d, p in rows if p > 0]
    dec = [d for d, p in rows if p == 0]
    print(f"{label}: {len(rows)} chunks; "
          f"prefill-phase {len(mix)} x {1e3*np.mean(mix) if mix else 0:.0f}"
          f" ms; decode-phase {len(dec)} x "
          f"{1e3*np.mean(dec) if dec else 0:.0f} ms", flush=True)
    for d, p in rows[:14]:
        print(f"  chunk {d*1e3:7.1f} ms  prefilling_rows={p}", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None)
    ap.add_argument("--width", type=int, default=8)
    ap.add_argument("--layers", type=int, default=40)
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)
    rt = build_rt(args.layers)
    run(rt, fused=False, width=args.width)
    run(rt, fused=True, width=args.width, trace_dir=args.trace)
