"""On-chip probe: the multi-query ragged kernel at the EXACT geometries
that VMEM-OOM'd in the r4 session-1 fused serving benches (19.9 MB dense /
24.1 MB paged vs the 16 MB scoped limit), after the body_multi restructure
(fori_loop row selection + <=32-row compute sub-chunks).

Run on the TPU:  python scratch/tpu_multiq_vmem_probe.py
Prints compile+run status and a numerics check vs the XLA oracle for both
the dense-stacked and paged-stacked 13B layouts.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from seedx_tpu.ops.decode_attention import ragged_decode_attention

L, HKV, D = 40, 40, 128
F = HKV * D
W_SCALE = 128  # kv_scale_width lane pad


def oracle(q, k, v, ks, vs, starts, ends, layer):
    """Per-row multi-query stair vs dequantized full attention."""
    b, w, hq, d = q.shape
    kf = (k[layer].astype(jnp.float32)
          * jnp.repeat(ks[layer, ..., :HKV].astype(jnp.float32), D, -1))
    vf = (v[layer].astype(jnp.float32)
          * jnp.repeat(vs[layer, ..., :HKV].astype(jnp.float32), D, -1))
    s = kf.shape[1]
    out = np.zeros((b, w, hq, d), np.float32)
    for bi in range(b):
        for qi in range(w):
            e = min(int(ends[bi]) + qi, s)
            st = int(starts[bi])
            kk = kf[bi, st:e].reshape(e - st, HKV, D)
            vv = vf[bi, st:e].reshape(e - st, HKV, D)
            qq = np.asarray(q[bi, qi], np.float32)  # [Hq, D]
            sc = np.einsum("hd,thd->th", qq, np.asarray(kk)) * (D ** -0.5)
            p = np.exp(sc - sc.max(0, keepdims=True))
            p /= p.sum(0, keepdims=True)
            out[bi, qi] = np.einsum("th,thd->hd", p, np.asarray(vv))
    return out


def run(name, paged, b, s, w, block=0, pool_rows=0):
    key = jax.random.PRNGKey(0)
    ks_ = jax.random.split(key, 8)
    q = jax.random.normal(ks_[0], (b, w, HKV, D), jnp.bfloat16)
    if paged:
        kc = jax.random.randint(ks_[1], (L, pool_rows, F), -127, 127,
                                jnp.int8)
        vc = jax.random.randint(ks_[2], (L, pool_rows, F), -127, 127,
                                jnp.int8)
        ksc = jax.random.uniform(ks_[3], (L, pool_rows, W_SCALE),
                                 jnp.bfloat16, 0.001, 0.02)
        vsc = jax.random.uniform(ks_[4], (L, pool_rows, W_SCALE),
                                 jnp.bfloat16, 0.001, 0.02)
        n_tiles = s // block
        tables = jnp.arange(b * n_tiles, dtype=jnp.int32).reshape(b, n_tiles)
    else:
        kc = jax.random.randint(ks_[1], (L, b, s, F), -127, 127, jnp.int8)
        vc = jax.random.randint(ks_[2], (L, b, s, F), -127, 127, jnp.int8)
        ksc = jax.random.uniform(ks_[3], (L, b, s, W_SCALE), jnp.bfloat16,
                                 0.001, 0.02)
        vsc = jax.random.uniform(ks_[4], (L, b, s, W_SCALE), jnp.bfloat16,
                                 0.001, 0.02)
        tables = None
    starts = jnp.zeros((b,), jnp.int32)
    ends = jnp.arange(1, b + 1, dtype=jnp.int32) * (s // (b + 1))
    layer = jnp.int32(L // 2)

    fn = jax.jit(lambda *a: ragged_decode_attention(
        a[0], a[1], a[2], a[3], a[4], k_scale=a[5], v_scale=a[6],
        block_tables=tables, layer=a[7], kv_heads=HKV,
        block=block))
    t0 = time.perf_counter()
    out = fn(q, kc, vc, starts, ends, ksc, vsc, layer)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t_compile = time.perf_counter() - t0

    # timed: data-dependent iterations (tunnel dedupes identical launches)
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(20):
        out = fn(q, kc, vc, starts + 0 * i, ends, ksc, vsc, layer)
        acc += float(out[0, 0, 0, 0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / 20

    if paged:
        # rebuild the dense view for the oracle
        kd = kc.reshape(L, pool_rows // block, block, F)[
            :, tables.reshape(-1)].reshape(L, b, s, F)
        vd = vc.reshape(L, pool_rows // block, block, F)[
            :, tables.reshape(-1)].reshape(L, b, s, F)
        ksd = ksc.reshape(L, pool_rows // block, block, W_SCALE)[
            :, tables.reshape(-1)].reshape(L, b, s, W_SCALE)
        vsd = vsc.reshape(L, pool_rows // block, block, W_SCALE)[
            :, tables.reshape(-1)].reshape(L, b, s, W_SCALE)
        ref = oracle(q, kd, vd, ksd, vsd, starts, ends, L // 2)
    else:
        ref = oracle(q, kc, vc, ksc, vsc, starts, ends, L // 2)
    got = np.asarray(out, np.float32)
    rms = float(np.sqrt((ref ** 2).mean())) + 1e-9
    err = float(np.abs(got - ref).max()) / rms
    print(f"{name}: compile+first {t_compile:.1f}s, step {dt*1e6:.0f}us, "
          f"rel_err {err:.4f} {'OK' if err < 0.05 else 'FAIL'}", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    # dense-stacked: the serve_continuous fused geometry (S=256+128)
    run("dense w=8", False, b=8, s=384, w=8)
    run("dense w=16", False, b=8, s=384, w=16)
    # paged-stacked: 12 slots, page 128; pool holds b*s rows for the
    # identity block table
    run("paged w=8", True, b=12, s=384, w=8, block=128,
        pool_rows=12 * 384)
