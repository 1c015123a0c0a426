"""Microbench: int4_matmul at 13B decode shapes, data-dependent chain."""
import time, functools
import jax, jax.numpy as jnp
import numpy as np
from seedx_tpu.ops.int4_matmul import int4_matmul

rng = np.random.RandomState(0)
K = 50

def bench(n_in, n_out, bo):
    x0 = jnp.asarray(rng.randn(1, n_in), jnp.bfloat16)
    packed = jnp.asarray(rng.randint(0, 255, (n_in // 2, n_out)), jnp.uint8)
    scale = jnp.asarray(rng.rand(n_in // 128, n_out) * 1e-4, jnp.float32)

    @jax.jit
    def chain(x, p, s):
        def body(i, x):
            y = int4_matmul(x, p, s, block_out=bo)
            # REAL data dependence (no algebraic zero XLA could hoist)
            return x * (1.0 + 1e-12 * jnp.mean(y)).astype(x.dtype)
        return jax.lax.fori_loop(0, K, body, x)

    y = chain(x0, packed, scale); float(jnp.sum(y.astype(jnp.float32)))
    t0 = time.perf_counter()
    y = chain(x0, packed, scale)
    float(jnp.sum(y.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / K
    gb = packed.nbytes / 1e9
    print(f"in={n_in} out={n_out} bo={bo}: {dt*1e6:.0f} us/call, {gb/dt:.0f} GB/s", flush=True)

for n_in, n_out, bos in [(5120, 5120, (512, 1024)),
                         (5120, 13824, (512, 1536)),
                         (13824, 5120, (512, 1024))]:
    for bo in bos:
        bench(n_in, n_out, bo)
