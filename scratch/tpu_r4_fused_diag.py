"""On-chip isolation of the packed fused-prefill regression (r4 session 4:
packed fused dense @32 requests measured 111.4 tok/s vs 291.4 legacy —
nearly the windowed layout's 121.8, even though the packed step carries
only slots + w real tokens).

Hypotheses to separate:
  A. per-step cost: the packed mixed step itself is much more expensive
     than the pure decode step (kernel / scatter / cache-write pathology)
     -> time _mixed_chunk with ZERO prefilling rows vs _decode_chunk on
     the same state.
  B. scheduling: the step is fine but prefill bandwidth (w tokens/step
     shared across prefilling rows) starves admission
     -> time _mixed_chunk while 8 rows prefill 120-token prompts.

Run (TPU):  PYTHONPATH=/root/repo:/root/.axon_site python scratch/tpu_r4_fused_diag.py
Timings closed by host float() fetches (axon block_until_ready doesn't
block); state mutates every chunk so the tunnel can't dedupe executions.
"""
import sys
import time
import types

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from bench import _fill_like
from seedx_tpu.inference.continuous import (ContinuousEngine, _decode_chunk,
                                            _mixed_chunk)
from seedx_tpu.models.agent import AgentConfig, ContinuousLVLM
from seedx_tpu.models.llama import llama2_13b
from seedx_tpu.text.tokenizer import load_tokenizer

NUM_LAYERS = int(sys.argv[sys.argv.index("--layers") + 1]) \
    if "--layers" in sys.argv else 40


def build_rt():
    llm_cfg = llama2_13b(quantization="int4", num_layers=NUM_LAYERS,
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
    params = _fill_like(shapes)
    return types.SimpleNamespace(agent=model, agent_params=params,
                                 agent_cfg=agent_cfg,
                                 tokenizer=load_tokenizer())


def fetch(state):
    return float(jnp.asarray(state["pos"]).sum()) + \
        float(jnp.asarray(state["n"]).sum())


def time_chunks(fn, state, n=4, label=""):
    # warm (compile) once
    state = fn(state)
    fetch(state)
    t0 = time.perf_counter()
    for _ in range(n):
        state = fn(state)
    fetch(state)
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt * 1000:.1f} ms/chunk "
          f"({dt / 32 * 1000:.2f} ms/step)", flush=True)
    return state, dt


def main():
    rt = build_rt()
    rng = np.random.RandomState(0)
    eng = ContinuousEngine(rt, slots=8, max_new_tokens=1024, chunk_steps=32,
                           prompt_buckets=(256,), fused_prefill=True,
                           prefill_width=8)
    print(f"packed={eng._packed} layers={NUM_LAYERS}", flush=True)
    eng.warmup()
    # 8 requests, 240-token prompts: the timed "mixed, 8 prefilling"
    # window (warmup + 3 chunks x 32 steps x width 8 = up to 1024 packed
    # prompt tokens) must stay inside the prefill phase, so supply
    # 8 x 240 = 1920 prompt tokens (ADVICE r4: 120-token prompts ran dry
    # mid-window, diluting the measurement with post-prefill steps).
    for i in range(8):
        p = 240
        eng.submit({"input_ids": [1] + list(rng.randint(3, 30000, p)),
                    "image_embeds": None}, max_new_tokens=1024)
    eng._admit_pending()
    st = eng.state

    mixed = lambda s: _mixed_chunk(eng.model, eng.variables, s, eng.gen_cfg,
                                   eng.vocab, eng.chunk_steps, eng._s_max,
                                   eng.prefill_width, packed=eng._packed)
    decode = lambda s: _decode_chunk(eng.model, eng.variables, s,
                                     eng.gen_cfg, eng.vocab, eng.chunk_steps,
                                     eng._s_max)

    # B: mixed chunk while 8 rows prefill (first chunks burn prompt)
    st, dt_pre = time_chunks(mixed, st, n=3, label="mixed, 8 prefilling")
    # drive until all prompts consumed
    while float(jnp.asarray((st["p_pos"] < st["p_len"]).sum())) > 0:
        st = mixed(st)
    fetch(st)
    # A: mixed chunk with ZERO prefilling rows vs pure decode chunk
    st, dt_mix0 = time_chunks(mixed, st, n=4, label="mixed, 0 prefilling")
    st, dt_dec = time_chunks(decode, st, n=4, label="pure decode chunk")
    print("running rows:", int(jnp.asarray(st["running"]).sum()))
    print(f"RATIO mixed0/decode = {dt_mix0 / dt_dec:.2f}", flush=True)
    print(f"RATIO mixed_prefill/decode = {dt_pre / dt_dec:.2f}", flush=True)


if __name__ == "__main__":
    main()
