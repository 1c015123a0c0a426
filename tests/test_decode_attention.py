"""ragged_decode_attention vs the XLA attention path (numerics oracle).

Tolerance contract (kernel v3, bf16-operand MXU): the kernel computes with
single-pass bf16 operands and f32 MXU accumulation.  For PRODUCTION data
(bf16 or int8 caches, bf16 q, bf16 scales) the score products are exact;
the only rounding is the post-softmax weight broadcast (p cast to bf16,
<= 2^-9 relative) — pinned tightly by test_bf16_data_value_rounding_bound.
These oracle tests feed fp32 inputs for convenience, which the kernel
rounds to bf16 on entry (another <= 2^-9 relative on q/k/v/scales), so
they assert ~1e-2 absolute (2^-9 x the randn |v| range) — the bf16
representation level — not fp32 exactness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedx_tpu.ops.attention import dot_product_attention
from seedx_tpu.ops.decode_attention import ragged_decode_attention
from seedx_tpu.models.llama import quantize_kv


def _ref(q, k, v, starts, ends):
    """XLA oracle: [B, 1, Hq, D] query over dense [B, S, Hkv, D] cache."""
    s = k.shape[1]
    kv_valid = ((jnp.arange(s)[None, :] >= starts[:, None])
                & (jnp.arange(s)[None, :] < ends[:, None]))
    out = dot_product_attention(q[:, None], k, v, kv_valid=kv_valid,
                                causal=False, impl="xla")
    return out[:, 0]


def _rand(b=3, s=64, hq=4, hkv=4, d=32, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, hq, d), dtype)
    k = jax.random.normal(ks[1], (b, s, hkv, d), dtype)
    v = jax.random.normal(ks[2], (b, s, hkv, d), dtype)
    return q, k, v


@pytest.mark.parametrize("starts,ends", [
    ([0, 0, 0], [64, 64, 64]),           # full windows
    ([0, 5, 17], [64, 40, 18]),          # ragged, incl. a 1-token row
    ([3, 3, 3], [11, 32, 64]),           # left-padded prompts
])
def test_matches_xla_windows(starts, ends):
    q, k, v = _rand()
    b, s, hkv, d = k.shape
    st = jnp.asarray(starts, jnp.int32)
    en = jnp.asarray(ends, jnp.int32)
    got = ragged_decode_attention(q, k.reshape(b, s, -1),
                                  v.reshape(b, s, -1), st, en,
                                  kv_heads=hkv)
    want = _ref(q, k, v, st, en)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-2, rtol=5e-2)


def test_gqa_grouped_heads():
    q, k, v = _rand(b=2, s=32, hq=8, hkv=2, d=16, seed=1)
    b, s, hkv, d = k.shape
    st = jnp.asarray([0, 4], jnp.int32)
    en = jnp.asarray([32, 20], jnp.int32)
    got = ragged_decode_attention(q, k.reshape(b, s, -1),
                                  v.reshape(b, s, -1), st, en,
                                  kv_heads=hkv)
    want = _ref(q, k, v, st, en)   # dot_product_attention repeats kv heads
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-2, rtol=5e-2)


def test_int8_cache_with_scales():
    q, k, v = _rand(b=2, s=48, hq=4, hkv=4, d=32, seed=2)
    b, s, hkv, d = k.shape
    kq, ksc = quantize_kv(k)     # [b, s, hkv, d] int8, [b, s, hkv, 1]
    vq, vsc = quantize_kv(v)
    st = jnp.asarray([0, 9], jnp.int32)
    en = jnp.asarray([48, 30], jnp.int32)
    got = ragged_decode_attention(
        q, kq.reshape(b, s, -1), vq.reshape(b, s, -1), st, en,
        k_scale=ksc.reshape(b, s, hkv), v_scale=vsc.reshape(b, s, hkv),
        kv_heads=hkv)
    kd = (kq.astype(jnp.float32) * ksc).astype(jnp.float32)
    vd = (vq.astype(jnp.float32) * vsc).astype(jnp.float32)
    want = _ref(q, kd, vd, st, en)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-2, rtol=5e-2)


def test_bf16_cache_fp32_accumulation():
    q, k, v = _rand(b=2, s=32, dtype=jnp.bfloat16, seed=3)
    b, s, hkv, d = k.shape
    st = jnp.asarray([0, 0], jnp.int32)
    en = jnp.asarray([32, 7], jnp.int32)
    got = ragged_decode_attention(q, k.reshape(b, s, -1),
                                  v.reshape(b, s, -1), st, en,
                                  kv_heads=hkv)
    want = _ref(q, k, v, st, en)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_paged_pool_matches_dense():
    """Scatter the dense rows into a shuffled pool; block tables must
    reproduce the dense result exactly."""
    block = 16
    q, k, v = _rand(b=2, s=64, hq=4, hkv=4, d=32, seed=4)
    b, s, hkv, d = k.shape
    n_tiles = s // block
    rng = np.random.RandomState(0)
    # physical pool: 2*b*n_tiles tiles, logical tiles scattered randomly
    pool_tiles = 2 * b * n_tiles
    perm = rng.permutation(pool_tiles)[:b * n_tiles].reshape(b, n_tiles)
    kf = np.asarray(k.reshape(b, s, -1))
    vf = np.asarray(v.reshape(b, s, -1))
    k_pool = np.zeros((pool_tiles * block, hkv * d), np.float32)
    v_pool = np.zeros((pool_tiles * block, hkv * d), np.float32)
    for i in range(b):
        for j in range(n_tiles):
            t = perm[i, j]
            k_pool[t * block:(t + 1) * block] = kf[i, j * block:(j + 1) * block]
            v_pool[t * block:(t + 1) * block] = vf[i, j * block:(j + 1) * block]
    st = jnp.asarray([0, 10], jnp.int32)
    en = jnp.asarray([64, 39], jnp.int32)
    got = ragged_decode_attention(
        q, jnp.asarray(k_pool), jnp.asarray(v_pool), st, en,
        block_tables=jnp.asarray(perm, jnp.int32), kv_heads=hkv,
        block=block)
    want = _ref(q, k, v, st, en)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-2, rtol=5e-2)


def test_stacked_layer_cache():
    """[L, B, S, F] stacked cache + a traced layer index must equal the
    dense per-layer call (the decode_layers_stacked integration shape)."""
    L = 3
    qs, ks_, vs_ = zip(*[_rand(b=2, s=32, hq=4, hkv=4, d=16, seed=10 + i)
                         for i in range(L)])
    b, s, hkv, d = ks_[0].shape
    k_stack = jnp.stack([k.reshape(b, s, -1) for k in ks_])
    v_stack = jnp.stack([v.reshape(b, s, -1) for v in vs_])
    st = jnp.asarray([0, 6], jnp.int32)
    en = jnp.asarray([32, 19], jnp.int32)

    @jax.jit
    def run(li):
        return ragged_decode_attention(qs[1], k_stack, v_stack, st, en,
                                       layer=li, kv_heads=hkv)

    for li in range(L):
        got = run(jnp.int32(li))
        want = _ref(qs[1], ks_[li], vs_[li], st, en)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-2, rtol=5e-2)


def test_stacked_int8_layer_cache():
    L = 2
    q, k0, v0 = _rand(b=2, s=32, hq=2, hkv=2, d=16, seed=20)
    _, k1, v1 = _rand(b=2, s=32, hq=2, hkv=2, d=16, seed=21)
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
    kd = (kq1.astype(jnp.float32) * ks1)
    vd = (vq1.astype(jnp.float32) * vs1)
    want = _ref(q, kd, vd, st, en)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-2, rtol=5e-2)


def test_paged_stacked_pool():
    """[L, pool_rows, F] pool + block tables + layer scalar — the paged
    continuous-serving layout."""
    L, block = 2, 16
    q, k0, v0 = _rand(b=2, s=32, hq=4, hkv=4, d=16, seed=30)
    _, k1, v1 = _rand(b=2, s=32, hq=4, hkv=4, d=16, seed=31)
    b, s, hkv, d = k0.shape
    n_tiles = s // block
    rng = np.random.RandomState(1)
    pool_tiles = 2 * b * n_tiles
    perm = rng.permutation(pool_tiles)[:b * n_tiles].reshape(b, n_tiles)
    k_pool = np.zeros((L, pool_tiles * block, hkv * d), np.float32)
    v_pool = np.zeros((L, pool_tiles * block, hkv * d), np.float32)
    for li, (kk, vv) in enumerate([(k0, v0), (k1, v1)]):
        kf = np.asarray(kk.reshape(b, s, -1))
        vf = np.asarray(vv.reshape(b, s, -1))
        for i in range(b):
            for j in range(n_tiles):
                t = perm[i, j]
                k_pool[li, t * block:(t + 1) * block] = \
                    kf[i, j * block:(j + 1) * block]
                v_pool[li, t * block:(t + 1) * block] = \
                    vf[i, j * block:(j + 1) * block]
    st = jnp.asarray([0, 7], jnp.int32)
    en = jnp.asarray([32, 25], jnp.int32)
    for li, (kk, vv) in enumerate([(k0, v0), (k1, v1)]):
        got = ragged_decode_attention(
            q, jnp.asarray(k_pool), jnp.asarray(v_pool), st, en,
            block_tables=jnp.asarray(perm, jnp.int32),
            layer=jnp.int32(li), kv_heads=hkv, block=block)
        want = _ref(q, kk, vv, st, en)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-2, rtol=5e-2)


def test_odd_cache_length_picks_divisor_block():
    # s=40 -> block falls back to 8; still exact
    q, k, v = _rand(b=2, s=40, hq=2, hkv=2, d=16, seed=5)
    b, s, hkv, d = k.shape
    st = jnp.asarray([0, 3], jnp.int32)
    en = jnp.asarray([40, 21], jnp.int32)
    got = ragged_decode_attention(q, k.reshape(b, s, -1),
                                  v.reshape(b, s, -1), st, en,
                                  kv_heads=hkv)
    want = _ref(q, k, v, st, en)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-2, rtol=5e-2)


def test_multi_query_window_stair():
    """Multi-query window mode (the fused prefill+decode step): q
    [B, w, Hq, D], query slot i attends [start, end+i) — vs an XLA
    per-query stair oracle."""
    b, s, w, hq, hkv, d = 3, 64, 4, 4, 4, 32
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (b, w, hq, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, hkv, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, hkv, d), jnp.float32)
    starts = jnp.asarray([0, 2, 5], jnp.int32)
    ends = jnp.asarray([9, 3, 62], jnp.int32)   # row 2's stair clamps at 64

    out = ragged_decode_attention(q, k.reshape(b, s, -1),
                                  v.reshape(b, s, -1), starts, ends,
                                  kv_heads=hkv)
    assert out.shape == (b, w, hq, d)
    pos = jnp.arange(s)
    for i in range(w):
        kv_valid = ((pos[None, :] >= starts[:, None])
                    & (pos[None, :] < jnp.minimum(ends + i, s)[:, None]))
        ref = dot_product_attention(q[:, i:i + 1], k, v, kv_valid=kv_valid,
                                    causal=False, impl="xla")[:, 0]
        np.testing.assert_allclose(np.asarray(out[:, i], np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=1e-2, rtol=2e-2)


def test_multi_query_int8_gqa_stacked():
    """Multi-query mode composes with int8 scales, GQA grouping, and the
    stacked layer axis."""
    b, s, w, hkv, g, d = 2, 32, 3, 2, 2, 64
    hq = hkv * g
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    q = jax.random.normal(ks[0], (b, w, hq, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, hkv, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, hkv, d), jnp.float32)
    kq, ksc = quantize_kv(k)
    vq, vsc = quantize_kv(v)
    L = 2
    kc = jnp.zeros((L, b, s, hkv * d), jnp.int8).at[1].set(
        kq.reshape(b, s, -1))
    vc = jnp.zeros((L, b, s, hkv * d), jnp.int8).at[1].set(
        vq.reshape(b, s, -1))
    kss = jnp.zeros((L, b, s, hkv), jnp.float32).at[1].set(
        ksc.reshape(b, s, hkv).astype(jnp.float32))
    vss = jnp.zeros((L, b, s, hkv), jnp.float32).at[1].set(
        vsc.reshape(b, s, hkv).astype(jnp.float32))
    starts = jnp.asarray([0, 4], jnp.int32)
    ends = jnp.asarray([10, 30], jnp.int32)
    out = ragged_decode_attention(q, kc, vc, starts, ends, k_scale=kss,
                                  v_scale=vss, layer=jnp.int32(1),
                                  kv_heads=hkv)
    kd = (kq.astype(jnp.float32)
          * ksc.astype(jnp.float32)).reshape(b, s, hkv, d)
    vd = (vq.astype(jnp.float32)
          * vsc.astype(jnp.float32)).reshape(b, s, hkv, d)
    pos = jnp.arange(s)
    for i in range(w):
        kv_valid = ((pos[None, :] >= starts[:, None])
                    & (pos[None, :] < jnp.minimum(ends + i, s)[:, None]))
        ref = dot_product_attention(q[:, i:i + 1], kd, vd,
                                    kv_valid=kv_valid, causal=False,
                                    impl="xla")[:, 0]
        np.testing.assert_allclose(np.asarray(out[:, i], np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=1e-2, rtol=2e-2)


def test_bf16_data_value_rounding_bound():
    """The v3 tight contract on PRODUCTION-representative data: with bf16
    q/k/v (exact bf16 operands, f32 MXU accumulation) the only kernel
    rounding is the post-softmax weight broadcast (p cast to bf16), so the
    output must sit within ~2^-9 relative of an oracle that does the same
    math in f32 on the SAME bf16 values."""
    q, k, v = _rand(b=3, s=64, hq=4, hkv=4, d=32, dtype=jnp.bfloat16,
                    seed=7)
    b, s, hkv, d = k.shape
    st = jnp.asarray([0, 5, 17], jnp.int32)
    en = jnp.asarray([64, 40, 18], jnp.int32)
    got = ragged_decode_attention(q, k.reshape(b, s, -1),
                                  v.reshape(b, s, -1), st, en,
                                  kv_heads=hkv)
    # oracle in f32 over the identical bf16 values
    want = _ref(q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32), st, en)
    got32 = np.asarray(got, np.float32)
    want32 = np.asarray(want, np.float32)
    vmax = float(np.abs(np.asarray(v, np.float32)).max())
    # p rounding (2^-9, weights sum to 1) + output bf16 cast (2^-8)
    bound = vmax * (2.0 ** -9) + np.abs(want32) * (2.0 ** -8) + 1e-6
    assert (np.abs(got32 - want32) <= bound).all()
