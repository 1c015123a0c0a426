"""Is one [d, 3d] dot faster than three [d, d] dots at SDXL UNet
transformer shapes?  (The to_q/to_k/to_v fusion question.)  Chained
through activation-sized bf16 tensors so no fp32 spill floor; interleaved
in one process so tunnel drift cancels.
"""
import time

import jax
import jax.numpy as jnp

SHAPES = [("stage64 (8192 tok, 640)", 8192, 640),
          ("stage32 (2048 tok, 1280)", 2048, 1280)]


def bench(mode, m, d, iters=60):
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    if mode == "fused":
        wf = jax.random.normal(ks[0], (d, 3 * d), jnp.bfloat16) * 0.02
    else:
        w3 = [jax.random.normal(k, (d, d), jnp.bfloat16) * 0.02 for k in ks]
    x0 = jax.random.normal(jax.random.PRNGKey(0), (m, d), jnp.bfloat16)

    def step(x):
        if mode == "fused":
            h = x @ wf
            return h[:, :d] + h[:, d:2 * d] + h[:, 2 * d:]
        return (x @ w3[0]) + (x @ w3[1]) + (x @ w3[2])

    @jax.jit
    def run(x):
        def body(x, i):
            return step(x) + x * 1e-3, None

        x, _ = jax.lax.scan(body, x, jnp.arange(iters))
        return jnp.sum(x.astype(jnp.float32))

    float(run(x0))
    best = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        float(run(x0))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


for name, m, d in SHAPES:
    t3 = bench("three", m, d)
    tf = bench("fused", m, d)
    fl = 3 * 2 * m * d * d
    print(f"{name}: three {t3*1e6:7.1f}us ({fl/t3/1e12:5.1f}T)  "
          f"fused {tf*1e6:7.1f}us ({fl/tf/1e12:5.1f}T)  "
          f"speedup {t3/tf:.2f}x", flush=True)
