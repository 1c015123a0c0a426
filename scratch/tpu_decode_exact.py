"""On-TPU exactness sweep for the ragged decode-attention kernel.

The pytest suite runs the kernel in interpret mode (conftest forces CPU);
this script re-runs the oracle matrix on the REAL chip, where
ragged_decode_attention dispatches the Mosaic-compiled kernel — a kernel
can compile and still be wrong (layout/DMA bugs), so the bench A/B alone
is not sufficient validation.  Geometries respect the TPU dispatch rules
(kv_heads*head_dim % 128 == 0; tile a multiple of the dtype granule); the
13B serving geometry (Hq=Hkv=40, D=128, S=1280, int8 KV, B=8) is the
production case.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/tests")
from test_decode_attention import _rand, _ref  # noqa: E402

from seedx_tpu.models.llama import quantize_kv  # noqa: E402
from seedx_tpu.ops.decode_attention import ragged_decode_attention  # noqa: E402

assert jax.default_backend() == "tpu", jax.default_backend()


def check(got, want, tol=2e-5):
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=tol, rtol=tol)


def case_windows(starts, ends):
    q, k, v = _rand(b=3, s=64, hq=4, hkv=4, d=32)
    b, s, hkv, d = k.shape
    st, en = jnp.asarray(starts, jnp.int32), jnp.asarray(ends, jnp.int32)
    got = ragged_decode_attention(q, k.reshape(b, s, -1),
                                  v.reshape(b, s, -1), st, en, kv_heads=hkv)
    check(got, _ref(q, k, v, st, en))


def case_gqa():
    q, k, v = _rand(b=2, s=32, hq=8, hkv=2, d=64, seed=1)
    b, s, hkv, d = k.shape
    st = jnp.asarray([0, 4], jnp.int32)
    en = jnp.asarray([32, 20], jnp.int32)
    got = ragged_decode_attention(q, k.reshape(b, s, -1),
                                  v.reshape(b, s, -1), st, en, kv_heads=hkv)
    check(got, _ref(q, k, v, st, en))


def case_int8():
    q, k, v = _rand(b=2, s=64, hq=4, hkv=4, d=32, seed=2)
    b, s, hkv, d = k.shape
    kq, ksc = quantize_kv(k)
    vq, vsc = quantize_kv(v)
    st = jnp.asarray([0, 9], jnp.int32)
    en = jnp.asarray([64, 30], jnp.int32)
    got = ragged_decode_attention(
        q, kq.reshape(b, s, -1), vq.reshape(b, s, -1), st, en,
        k_scale=ksc.reshape(b, s, hkv), v_scale=vsc.reshape(b, s, hkv),
        kv_heads=hkv)
    check(got, _ref(q, kq.astype(jnp.float32) * ksc,
                    vq.astype(jnp.float32) * vsc, st, en))


def case_bf16():
    q, k, v = _rand(b=2, s=32, dtype=jnp.bfloat16, seed=3)
    b, s, hkv, d = k.shape
    st = jnp.asarray([0, 0], jnp.int32)
    en = jnp.asarray([32, 7], jnp.int32)
    got = ragged_decode_attention(q, k.reshape(b, s, -1),
                                  v.reshape(b, s, -1), st, en, kv_heads=hkv)
    check(got, _ref(q, k, v, st, en), tol=2e-2)


def _scatter_pool(k, v, block, pool_tiles, perm):
    b, s, hkv, d = k.shape
    n_tiles = s // block
    kf, vf = np.asarray(k.reshape(b, s, -1)), np.asarray(v.reshape(b, s, -1))
    kp = np.zeros((pool_tiles * block, hkv * d), kf.dtype)
    vp = np.zeros((pool_tiles * block, hkv * d), vf.dtype)
    for i in range(b):
        for j in range(n_tiles):
            t = perm[i, j]
            kp[t * block:(t + 1) * block] = kf[i, j * block:(j + 1) * block]
            vp[t * block:(t + 1) * block] = vf[i, j * block:(j + 1) * block]
    return kp, vp


def case_paged():
    block = 16
    q, k, v = _rand(b=2, s=64, hq=4, hkv=4, d=32, seed=4)
    b, s, hkv, d = k.shape
    rng = np.random.RandomState(0)
    pool_tiles = 2 * b * (s // block)
    perm = rng.permutation(pool_tiles)[:b * (s // block)].reshape(b, -1)
    kp, vp = _scatter_pool(k, v, block, pool_tiles, perm)
    st = jnp.asarray([0, 10], jnp.int32)
    en = jnp.asarray([64, 39], jnp.int32)
    got = ragged_decode_attention(
        q, jnp.asarray(kp), jnp.asarray(vp), st, en,
        block_tables=jnp.asarray(perm, jnp.int32), kv_heads=hkv, block=block)
    check(got, _ref(q, k, v, st, en))


def case_stacked():
    L = 3
    qs, ks_, vs_ = zip(*[_rand(b=2, s=32, hq=4, hkv=4, d=32, seed=10 + i)
                         for i in range(L)])
    b, s, hkv, d = ks_[0].shape
    k_stack = jnp.stack([k.reshape(b, s, -1) for k in ks_])
    v_stack = jnp.stack([v.reshape(b, s, -1) for v in vs_])
    st = jnp.asarray([0, 6], jnp.int32)
    en = jnp.asarray([32, 19], jnp.int32)
    for li in range(L):
        got = ragged_decode_attention(qs[1], k_stack, v_stack, st, en,
                                      layer=jnp.int32(li), kv_heads=hkv)
        check(got, _ref(qs[1], ks_[li], vs_[li], st, en))


def case_stacked_int8():
    q, k0, v0 = _rand(b=2, s=32, hq=2, hkv=2, d=64, seed=20)
    _, k1, v1 = _rand(b=2, s=32, hq=2, hkv=2, d=64, seed=21)
    b, s, hkv, d = k0.shape
    kq0, ks0 = quantize_kv(k0)
    kq1, ks1 = quantize_kv(k1)
    vq0, vs0 = quantize_kv(v0)
    vq1, vs1 = quantize_kv(v1)
    k_stack = jnp.stack([kq0.reshape(b, s, -1), kq1.reshape(b, s, -1)])
    v_stack = jnp.stack([vq0.reshape(b, s, -1), vq1.reshape(b, s, -1)])
    ks_stack = jnp.stack([ks0.reshape(b, s, hkv), ks1.reshape(b, s, hkv)])
    vs_stack = jnp.stack([vs0.reshape(b, s, hkv), vs1.reshape(b, s, hkv)])
    st = jnp.asarray([0, 2], jnp.int32)
    en = jnp.asarray([30, 32], jnp.int32)
    got = ragged_decode_attention(q, k_stack, v_stack, st, en,
                                  k_scale=ks_stack, v_scale=vs_stack,
                                  layer=jnp.int32(1), kv_heads=hkv)
    check(got, _ref(q, kq1.astype(jnp.float32) * ks1,
                    vq1.astype(jnp.float32) * vs1, st, en))


def case_paged_stacked():
    L, block = 2, 16
    q, k0, v0 = _rand(b=2, s=32, hq=4, hkv=4, d=32, seed=30)
    _, k1, v1 = _rand(b=2, s=32, hq=4, hkv=4, d=32, seed=31)
    b, s, hkv, d = k0.shape
    rng = np.random.RandomState(1)
    pool_tiles = 2 * b * (s // block)
    perm = rng.permutation(pool_tiles)[:b * (s // block)].reshape(b, -1)
    kps, vps = [], []
    for kk, vv in [(k0, v0), (k1, v1)]:
        kp, vp = _scatter_pool(kk, vv, block, pool_tiles, perm)
        kps.append(kp)
        vps.append(vp)
    st = jnp.asarray([0, 7], jnp.int32)
    en = jnp.asarray([32, 25], jnp.int32)
    for li, (kk, vv) in enumerate([(k0, v0), (k1, v1)]):
        got = ragged_decode_attention(
            q, jnp.asarray(np.stack(kps)), jnp.asarray(np.stack(vps)),
            st, en, block_tables=jnp.asarray(perm, jnp.int32),
            layer=jnp.int32(li), kv_heads=hkv, block=block)
        check(got, _ref(q, kk, vv, st, en))


def case_odd_len():
    # s = 40 -> block falls back to 8 (fp32 granule); still exact
    q, k, v = _rand(b=2, s=40, hq=2, hkv=2, d=64, seed=5)
    b, s, hkv, d = k.shape
    st = jnp.asarray([0, 3], jnp.int32)
    en = jnp.asarray([40, 21], jnp.int32)
    got = ragged_decode_attention(q, k.reshape(b, s, -1),
                                  v.reshape(b, s, -1), st, en, kv_heads=hkv)
    check(got, _ref(q, k, v, st, en))


def case_13b_serving():
    b, s, hkv, d = 8, 1280, 40, 128
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(ks[0], (b, hkv, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, s, hkv, d), jnp.float32) / 8
    v = jax.random.normal(ks[2], (b, s, hkv, d), jnp.float32) / 8
    kq, ksc = quantize_kv(k)
    vq, vsc = quantize_kv(v)
    st = jnp.asarray([0, 3, 100, 0, 512, 7, 0, 1279], jnp.int32)
    en = jnp.asarray([1280, 640, 101, 64, 1280, 1270, 1, 1280], jnp.int32)
    got = ragged_decode_attention(
        q, kq.reshape(b, s, -1), vq.reshape(b, s, -1), st, en,
        k_scale=ksc.reshape(b, s, hkv), v_scale=vsc.reshape(b, s, hkv),
        kv_heads=hkv)
    want = _ref(q.astype(jnp.float32), kq.astype(jnp.float32) * ksc,
                vq.astype(jnp.float32) * vsc, st, en)
    check(got, want, tol=3e-2)


def main():
    cases = [
        ("windows_full", lambda: case_windows([0, 0, 0], [64, 64, 64])),
        ("windows_ragged", lambda: case_windows([0, 5, 17], [64, 40, 18])),
        ("windows_leftpad", lambda: case_windows([3, 3, 3], [11, 32, 64])),
        ("gqa", case_gqa),
        ("int8_scales", case_int8),
        ("bf16_fp32acc", case_bf16),
        ("paged", case_paged),
        ("stacked", case_stacked),
        ("stacked_int8", case_stacked_int8),
        ("paged_stacked", case_paged_stacked),
        ("odd_len", case_odd_len),
        ("13b_serving_int8kv", case_13b_serving),
    ]
    failed = []
    for name, fn in cases:
        try:
            fn()
            print(f"PASS {name}", flush=True)
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)
    print("RESULT:", "ALL-PASS" if not failed else f"FAILED={failed}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
