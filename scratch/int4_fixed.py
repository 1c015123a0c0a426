"""Isolate the fixed cost: N pallas calls per loop iteration, plus an
XLA-int8-matmul control."""
import time
import jax, jax.numpy as jnp
import numpy as np
from seedx_tpu.ops.int4_matmul import int4_matmul

rng = np.random.RandomState(0)
K = 50
n_in, n_out = 5120, 5120

def run(n_calls, use_pallas=True):
    x0 = jnp.asarray(rng.randn(1, n_in), jnp.bfloat16)
    packs = [jnp.asarray(rng.randint(0, 255, (n_in // 2, n_out)), jnp.uint8)
             for _ in range(n_calls)]
    scales = [jnp.asarray(rng.rand(n_in // 128, n_out) * 1e-4, jnp.float32)
              for _ in range(n_calls)]
    w8s = [jnp.asarray(rng.randint(-127, 127, (n_in, n_out)), jnp.int8)
           for _ in range(n_calls)]
    s8s = [jnp.asarray(rng.rand(n_out) * 1e-4, jnp.float32)
           for _ in range(n_calls)]

    @jax.jit
    def chain(x, packs, scales, w8s, s8s):
        def body(i, x):
            acc = x
            for j in range(n_calls):
                if use_pallas:
                    y = int4_matmul(acc, packs[j], scales[j], block_out=1024)
                else:
                    w = w8s[j].astype(jnp.bfloat16) * s8s[j].astype(jnp.bfloat16)[None]
                    y = jnp.dot(acc, w)
                acc = acc * (1.0 + 1e-12 * jnp.mean(y)).astype(x.dtype)
            return acc
        return jax.lax.fori_loop(0, K, body, x)

    y = chain(x0, packs, scales, w8s, s8s); float(jnp.sum(y.astype(jnp.float32)))
    t0 = time.perf_counter()
    y = chain(x0, packs, scales, w8s, s8s)
    float(jnp.sum(y.astype(jnp.float32)))
    return (time.perf_counter() - t0) / K

for n_calls in (1, 2, 4):
    dt_p = run(n_calls, True)
    dt_x = run(n_calls, False)
    print(f"calls={n_calls}: pallas {dt_p*1e6:.0f} us/iter, xla-int8 {dt_x*1e6:.0f} us/iter", flush=True)
