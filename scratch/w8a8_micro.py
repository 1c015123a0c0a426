"""Does XLA's s8xs8->s32 dot beat bf16 at SDXL UNet transformer shapes?

v1 of this bench chained iterations through a scalar, so every dot's
fp32/s32 output spilled to HBM and all shapes floored at ~570 us — it
measured the output-write bandwidth, not the MXU.  This version chains a
realistic FF pair (up-proj then down-proj, bf16 residual stream), so each
iteration's output IS the next input and stays activation-sized.  The
W8A8 variant includes the full dynamic per-token activation quantization
cost (abs-max reduce + scale + cast) and the dequant multiply.
"""
import time

import jax
import jax.numpy as jnp

SHAPES = [  # (name, tokens, dim)  — batch 2 CFG folded into tokens
    ("stage64 (8192 tok, 640)", 8192, 640),
    ("stage32 (2048 tok, 1280)", 2048, 1280),
]


def quant_rows(x):
    s = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
    s = jnp.maximum(s, 1e-6) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127
                 ).astype(jnp.int8)
    return q, s


def bench(mode, m, d, iters=40):
    kw = jax.random.PRNGKey(1)
    if mode == "w8a8":
        wu = jax.random.randint(kw, (d, 4 * d), -127, 128, jnp.int32
                                ).astype(jnp.int8)
        wd = jax.random.randint(kw, (4 * d, d), -127, 128, jnp.int32
                                ).astype(jnp.int8)
        su = jnp.full((4 * d,), 1e-2 / 127, jnp.float32)
        sd = jnp.full((d,), 1e-2 / 127, jnp.float32)
    else:
        wu = jax.random.normal(kw, (d, 4 * d), jnp.bfloat16) * 0.02
        wd = jax.random.normal(kw, (4 * d, d), jnp.bfloat16) * 0.02
        if mode == "w8":
            wu = (wu * 500).astype(jnp.int8)
            wd = (wd * 500).astype(jnp.int8)
            su = jnp.full((4 * d,), 1e-2 / 127, jnp.float32)
            sd = jnp.full((d,), 1e-2 / 127, jnp.float32)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (m, d), jnp.bfloat16)

    def ff(x):
        if mode == "w8a8":
            q, s = quant_rows(x)
            h = jax.lax.dot_general(q, wu, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            h = (h.astype(jnp.float32) * (s * su[None, :])).astype(jnp.bfloat16)
            h = jax.nn.gelu(h)
            q, s = quant_rows(h)
            y = jax.lax.dot_general(q, wd, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32) * (s * sd[None, :])
                    ).astype(jnp.bfloat16)
        u, v = wu, wd
        if mode == "w8":
            u = u.astype(jnp.bfloat16)
            v = v.astype(jnp.bfloat16)
        h = jax.nn.gelu(x @ u)
        y = h @ v
        if mode == "w8":
            y = y * sd[None, :].astype(jnp.bfloat16) * 127
        return y

    @jax.jit
    def run(x):
        def body(x, i):
            return ff(x) + x * 1e-3, None

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
    fl = 2 * m * d * 4 * d * 2
    res = {mode: bench(mode, m, d) for mode in ("bf16", "w8", "w8a8")}
    line = f"{name}:"
    for mode, t in res.items():
        line += f"  {mode} {t*1e6:7.1f}us ({fl/t/1e12:5.1f}T)"
    line += f"  w8a8 vs bf16 {res['bf16']/res['w8a8']:.2f}x"
    print(line, flush=True)
