"""What does ONE fori_loop iteration cost on this backend?"""
import time
import jax, jax.numpy as jnp
import numpy as np

def bench(body, x0, K=200, tag=""):
    @jax.jit
    def chain(x):
        return jax.lax.fori_loop(0, K, body, x)
    y = chain(x0); float(jnp.sum(y.astype(jnp.float32)))
    t0 = time.perf_counter()
    y = chain(x0)
    float(jnp.sum(y.astype(jnp.float32)))
    print(f"{tag}: {(time.perf_counter()-t0)/K*1e6:.1f} us/iter", flush=True)

x0 = jnp.ones((1, 5120), jnp.bfloat16)
bench(lambda i, x: x * 1.0000001, x0, tag="tiny-mul")
w = jnp.asarray(np.random.RandomState(0).randn(5120, 5120), jnp.bfloat16)
bench(lambda i, x: (x @ w) * 1e-6 + x, x0, tag="bf16-matmul-5120x5120")
w8 = jnp.asarray(np.random.RandomState(0).randint(-127, 127, (5120, 5120)), jnp.int8)
s8 = jnp.ones((5120,), jnp.float32)
bench(lambda i, x: (x @ (w8.astype(jnp.bfloat16) * s8.astype(jnp.bfloat16)[None])) * 1e-6 + x,
      x0, tag="int8-dequant-matmul")
