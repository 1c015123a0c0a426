"""Which int8-UNet op family blows up XLA TPU compile time?  Compile
(never execute) small graphs: conv3x3 bf16 vs int8-weight, dense bf16 vs
int8-weight, and a 4-conv chain of each, all in one process; wall-clock
the .lower().compile() calls.
"""
import time

import jax
import jax.numpy as jnp


def compile_time(name, fn, *args):
    t0 = time.perf_counter()
    jax.jit(fn).lower(*args).compile()
    print(f"{name}: {time.perf_counter() - t0:.1f} s", flush=True)


C = 1280
x = jnp.zeros((2, 32, 32, C), jnp.bfloat16)
wb = jnp.zeros((3, 3, C, C), jnp.bfloat16)
wq = jnp.zeros((3, 3, C, C), jnp.int8)
s = jnp.ones((C,), jnp.float32)
db = jnp.zeros((C, C), jnp.bfloat16)
dq = jnp.zeros((C, C), jnp.int8)


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


compile_time("conv bf16       ", lambda x, w: conv(x, w), x, wb)
compile_time("conv int8w      ", lambda x, w: conv(x, w.astype(jnp.bfloat16)),
             x, wq)
compile_time("conv int8w+scale",
             lambda x, w, s: conv(x, w.astype(jnp.bfloat16))
             * s.astype(jnp.bfloat16), x, wq, s)
compile_time("dense bf16      ", lambda x, w: x @ w, x, db)
compile_time("dense int8w     ", lambda x, w: x @ w.astype(jnp.bfloat16),
             x, dq)


def chain(x, ws):
    for w in ws:
        x = conv(x, w.astype(jnp.bfloat16) if w.dtype == jnp.int8 else w)
    return x


compile_time("conv chain x4 bf16", chain, x, [wb] * 4)
compile_time("conv chain x4 int8", chain, x, [wq] * 4)
