"""Decode-layer loop: stacked-index kernel vs slice+per-layer kernel."""
import time
import jax, jax.numpy as jnp
import numpy as np
from seedx_tpu.ops.int4_matmul import int4_matmul, int4_matmul_stacked

rng = np.random.RandomState(0)
L, d, m = 40, 5120, 13824
def mk(n_in, n_out):
    return (jnp.asarray(rng.randint(0, 255, (L, n_in // 2, n_out)), jnp.uint8),
            jnp.asarray(rng.rand(L, n_in // 128, n_out) * 1e-4, jnp.float32))
qkv = mk(d, 3 * d)       # fused qkv as one stacked matmul
o = mk(d, d)
gu = mk(d, 2 * m)        # fused gate+up
down = mk(m, d)
x0 = jnp.ones((1, d), jnp.bfloat16)

@jax.jit
def token_stacked(x, qkv, o, gu, down):
    def body(li, x):
        a = int4_matmul_stacked(x, qkv[0], qkv[1], li, block_out=512)
        a = int4_matmul_stacked(a[:, :d], o[0], o[1], li, block_out=512)
        h = int4_matmul_stacked(x + a, gu[0], gu[1], li, block_out=512)
        g, u = h[:, :m], h[:, m:]
        dn = int4_matmul_stacked(jax.nn.silu(g) * u, down[0], down[1], li,
                                 block_out=512)
        return x + dn
    return jax.lax.fori_loop(0, L, body, x)

@jax.jit
def token_sliced(x, qkv, o, gu, down):
    def body(li, x):
        qkv_p = jax.lax.dynamic_index_in_dim(qkv[0], li, keepdims=False)
        qkv_s = jax.lax.dynamic_index_in_dim(qkv[1], li, keepdims=False)
        o_p = jax.lax.dynamic_index_in_dim(o[0], li, keepdims=False)
        o_s = jax.lax.dynamic_index_in_dim(o[1], li, keepdims=False)
        gu_p = jax.lax.dynamic_index_in_dim(gu[0], li, keepdims=False)
        gu_s = jax.lax.dynamic_index_in_dim(gu[1], li, keepdims=False)
        dn_p = jax.lax.dynamic_index_in_dim(down[0], li, keepdims=False)
        dn_s = jax.lax.dynamic_index_in_dim(down[1], li, keepdims=False)
        a = int4_matmul(x, qkv_p, qkv_s, block_out=512)
        a = int4_matmul(a[:, :d], o_p, o_s, block_out=512)
        h = int4_matmul(x + a, gu_p, gu_s, block_out=512)
        g, u = h[:, :m], h[:, m:]
        dn = int4_matmul(jax.nn.silu(g) * u, dn_p, dn_s, block_out=512)
        return x + dn
    return jax.lax.fori_loop(0, L, body, x)

gb = (qkv[0].nbytes + o[0].nbytes + gu[0].nbytes + down[0].nbytes) / 1e9
for name, f in (("stacked", token_stacked), ("sliced", token_sliced)):
    y = f(x0, qkv, o, gu, down); float(jnp.sum(y.astype(jnp.float32)))
    t0 = time.perf_counter(); reps = 8
    x = x0
    for _ in range(reps):
        x = f(x, qkv, o, gu, down)
    float(jnp.sum(x.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.2f} ms/token ({gb:.2f} GB -> {gb/dt:.0f} GB/s, {1/dt:.1f} tok/s-equniv)", flush=True)
