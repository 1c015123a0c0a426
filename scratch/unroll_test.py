"""fori_loop vs unrolled chain of dependent matmuls."""
import time
import jax, jax.numpy as jnp
import numpy as np
from seedx_tpu.ops.int4_matmul import int4_matmul

rng = np.random.RandomState(0)
n_in = n_out = 5120
K = 40  # one "token" worth of layers

x0 = jnp.ones((1, n_in), jnp.bfloat16)
w = jnp.asarray(rng.randn(n_in, n_out) * 0.001, jnp.bfloat16)
packed = jnp.asarray(rng.randint(0, 255, (n_in // 2, n_out)), jnp.uint8)
scale = jnp.asarray(rng.rand(n_in // 128, n_out) * 1e-4, jnp.float32)

def timeit(f, *a, reps=6):
    y = f(*a); float(jnp.sum(y.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        y = f(*a)
        a = (y * 1e-9 + a[0],) + a[1:]     # data-dependent across reps
    float(jnp.sum(y.astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps

@jax.jit
def loop_bf16(x, w):
    return jax.lax.fori_loop(0, K, lambda i, x: jnp.tanh(x @ w), x)

@jax.jit
def unroll_bf16(x, w):
    for _ in range(K):
        x = jnp.tanh(x @ w)
    return x

@jax.jit
def loop_int4(x, p, s):
    return jax.lax.fori_loop(
        0, K, lambda i, x: jnp.tanh(int4_matmul(x, p, s, block_out=1024)), x)

@jax.jit
def unroll_int4(x, p, s):
    for _ in range(K):
        x = jnp.tanh(int4_matmul(x, p, s, block_out=1024))
    return x

print(f"bf16 fori x{K}:   {timeit(loop_bf16, x0, w)*1e3:.2f} ms", flush=True)
print(f"bf16 unroll x{K}: {timeit(unroll_bf16, x0, w)*1e3:.2f} ms", flush=True)
print(f"int4 fori x{K}:   {timeit(loop_int4, x0, packed, scale)*1e3:.2f} ms", flush=True)
print(f"int4 unroll x{K}: {timeit(unroll_int4, x0, packed, scale)*1e3:.2f} ms", flush=True)
