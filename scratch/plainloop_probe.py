"""Isolate the slow plain arm of bench_spec_workload (r5 session 5).

Observed on chip: plain generate_tokens (spec_k=0, script-forced) reads
9.4-10.5 tok/s at 13B int4 geometry where the decode_13b scan-loop
microbench reads 82 tok/s — ~106 ms/step, suspiciously close to one
tunnel RTT or a per-call recompile.  The spec arms in the SAME interleaved
run time healthily (spec_always 143 tok/s = 44 rounds/s), so the engine's
verify path is fine; only the single-token while_loop arm is anomalous.

Differential design (all at 13B int4/int8-KV, script-forced so every
variant does identical-shape work):
  A. generate_tokens, t=64  -> chunk branch NOT in the loop (t < n_img+1)
  B. generate_tokens, t=96  -> chunk branch compiled into the loop
     (this matches the slow bench runs, t=226-340)
  C. raw lax.scan decode loop, t=64 (decode_13b style, same cache length)
If B is slow and A fast, the lax.cond(chunk_step|single_step) inside the
while body is the problem (e.g. XLA hoisting/duplicating the 65-token
forward); if both are slow, the while_loop itself (vs scan) is; if all
three are slow, it's the window/geometry and the bench numbers stand.

Each timed call perturbs inputs (tunnel dedupe) and closes with a host
float() fetch.

Run (TPU, serialized): PYTHONPATH=/root/repo:/root/.axon_site \
    python scratch/plainloop_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def main():
    from seedx_tpu.models.agent import AgentConfig, ContinuousLVLM
    from seedx_tpu.models.generation import GenerationConfig, generate_tokens
    from seedx_tpu.models.llama import init_kv_cache, llama2_13b
    from bench import _fill_like

    bucket = 256
    if "--small" in sys.argv:    # CPU wiring smoke, not a measurement
        from seedx_tpu.models.llama import llama_debug
        llm_cfg = llama_debug(hidden_size=128, intermediate_size=256,
                              num_layers=2, num_heads=4, num_kv_heads=4)
    else:
        llm_cfg = llama2_13b(quantization="int4", kv_quantization="int8",
                             param_dtype=jnp.bfloat16, remat=False)
    agent_cfg = (AgentConfig(llm=llm_cfg, vit_dim=64, resampler_heads=4)
                 if "--small" in sys.argv else AgentConfig(llm=llm_cfg))
    model = ContinuousLVLM(agent_cfg)
    ids8 = jnp.zeros((1, 8), jnp.int32)
    attn8 = jnp.ones((1, 8), bool)
    img = jnp.zeros((1, 256, agent_cfg.vit_dim), jnp.bfloat16)
    fmask = jnp.zeros((1,), bool)
    idsm = jnp.zeros((1, 8), bool)
    variables = {"params": _fill_like(nn.meta.unbox(jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), ids8, attn8,
                           jnp.where(attn8, ids8, -100), img, fmask, fmask,
                           idsm, idsm, jnp.full((1, 2), 0.5),
                           method="init_all"))["params"]))}
    jax.block_until_ready(variables)

    pids = list(range(5, 5 + 200))
    pad = bucket - len(pids)
    ids_p = jnp.asarray([[0] * pad + pids], jnp.int32)
    mask = jnp.asarray([[False] * pad + [True] * len(pids)])
    base_embeds = model.apply(variables, ids_p, method="embed_ids")
    last = jnp.asarray([pids[-1]], jnp.int32)

    def timed(label, fn, t, reps=3):
        fn(jnp.bfloat16(0))                      # compile + warm
        best = None
        for i in range(reps):
            t0 = time.perf_counter()
            out = fn(jnp.bfloat16(1e-6) * (i + 1))
            float(out)                            # host-close
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            print(f"  {label} rep{i}: {dt*1e3:.0f} ms "
                  f"({t/dt:.1f} tok/s)", flush=True)
        print(f"{label}: best {best*1e3:.0f} ms/call = "
              f"{t/best:.1f} tok/s", flush=True)
        return best

    def make_forced(t):
        cfg = GenerationConfig(max_new_tokens=t, prompt_buckets=(bucket,),
                               eos_token_id=-1, pad_token_id=0)
        # no n-gram self-similarity, no EOS, no <img>: all t steps run
        script = jnp.asarray((np.arange(t) * 7 + 31) % 20000 + 100,
                             jnp.int32)

        def run(shift):
            out = generate_tokens(model, variables, base_embeds + shift,
                                  mask, last, jax.random.PRNGKey(0), cfg,
                                  prompt_ids=ids_p, script_ids=script)
            return jnp.sum(out["tokens"])

        return run

    t_small, t_big = 64, 96
    total = bucket + t_small

    import functools

    @functools.partial(jax.jit)
    def scan_loop(shift):
        embeds = base_embeds + shift
        positions = jnp.maximum(
            jnp.cumsum(mask.astype(jnp.int32), axis=-1) - 1, 0)
        cache = init_kv_cache(llm_cfg, 1, total)
        kv_valid = jnp.concatenate(
            [mask, jnp.zeros((1, t_small), bool)], axis=-1)
        logits, _, cache = model.apply(variables, embeds, positions,
                                       kv_valid, cache, 0,
                                       method="llm_step")
        p_last = positions[:, -1]

        def step(carry, i):
            cache, token, pos = carry
            emb = model.apply(variables, token[:, None], method="embed_ids")
            kvv = jnp.concatenate(
                [mask, jnp.arange(t_small)[None, :] < i + 1], axis=-1)
            lg, _, cache = model.apply(variables, emb, (pos + 1)[:, None],
                                       kvv, cache, bucket + i,
                                       method="llm_step")
            return (cache, jnp.argmax(lg[:, 0], -1).astype(jnp.int32),
                    pos + 1), None

        first = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        (cache, tok, _), _ = jax.lax.scan(step, (cache, first, p_last),
                                          jnp.arange(t_small))
        return jnp.sum(tok)

    print(f"geometry: 13B int4/int8KV, bucket={bucket}", flush=True)
    a = timed(f"A while t={t_small} (no chunk branch)",
              make_forced(t_small), t_small)
    b_ = timed(f"B while t={t_big} (chunk branch in loop)",
               make_forced(t_big), t_big)
    c = timed(f"C scan t={t_small}", scan_loop, t_small)
    print("PLAINLOOP_PROBE", {
        "bucket": bucket,
        "ms_call": {"while_t64": round(a * 1e3),
                    "while_t96": round(b_ * 1e3),
                    "scan_t64": round(c * 1e3)},
        "tok_s": {"while_t64": round(t_small / a, 1),
                  "while_t96": round(t_big / b_, 1),
                  "scan_t64": round(t_small / c, 1)},
    }, flush=True)


if __name__ == "__main__":
    main()
