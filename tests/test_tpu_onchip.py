"""On-chip (NON-interpret) Mosaic kernel tier — run with ``pytest -m tpu``.

Every other test in the suite runs on the virtual CPU mesh, where the
Pallas kernels execute in interpret mode (ops/decode_attention.py &co
auto-interpret off-TPU) — so a green CPU suite never certifies the Mosaic
compiles.  This module is the standard TPU-session opener (VERDICT r3
item 3): real-chip numerics for flash attention fwd+bwd, the int4 W4A8
matmul (per-layer grid + stacked decode), ragged decode attention
(dense/paged, bf16/int8-KV), and the int8 KV round-trip.

Promoted from scratch/tpu_ragged_smoke.py (r3's ad-hoc check); geometries
are serving-like (13B GQA-shaped f = kv_heads*head_dim % 128 == 0) but
trimmed so the whole tier runs in a couple of minutes on the tunnelled
chip.  Off-TPU these tests auto-skip (tests/conftest.py hook).

Reference context: the reference has no kernel tests at all (its hot ops
live inside xformers/CUDA, SURVEY.md §2a); this tier is the first-party
replacement for that third-party trust.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def _xla_window_attention(q, k, v, starts, ends, scale):
    """fp32 masked attention over [start, end) windows.
    q [B,Hq,D], k/v [B,S,Hkv,D]."""
    b, hq, d = q.shape
    s, hkv = k.shape[1], k.shape[2]
    g = hq // hkv
    qf = q.astype(jnp.float32).reshape(b, hkv, g, d)
    logits = jnp.einsum("bhgd,bshd->bhgs", qf, k.astype(jnp.float32)) * scale
    pos = jnp.arange(s)[None, :]
    mask = (pos >= starts[:, None]) & (pos < ends[:, None])
    logits = jnp.where(mask[:, None, None, :], logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgs,bshd->bhgd", p, v.astype(jnp.float32))
    return out.reshape(b, hq, d)


@pytest.fixture(scope="module")
def ragged_case():
    """Shared serving-like geometry for the ragged-attention tests."""
    B, S, HKV, G, D = 8, 1280, 4, 10, 128   # f = 512, 13B-like GQA shape
    key = jax.random.PRNGKey(0)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, HKV * G, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, S, HKV, D), jnp.bfloat16)
    v = jax.random.normal(kv_, (B, S, HKV, D), jnp.bfloat16)
    starts = jnp.array([0, 64, 128, 0, 320, 512, 96, 768], jnp.int32)
    ends = jnp.array([1280, 512, 640, 96, 352, 1280, 128, 1024], jnp.int32)
    ref = np.asarray(jax.jit(_xla_window_attention, static_argnums=5)(
        q, k, v, starts, ends, D ** -0.5), np.float32)
    return dict(q=q, k=k, v=v, starts=starts, ends=ends, ref=ref,
                B=B, S=S, HKV=HKV, D=D)


def test_flash_attention_forward_windows():
    """Mosaic flash fwd vs XLA at a prefill-into-cache shape: causal,
    per-row [start, end) kv windows, q_offset alignment."""
    from seedx_tpu.ops.attention import dot_product_attention
    from seedx_tpu.ops.flash_attention import flash_attention

    B, Q, S, H, D = 2, 512, 768, 8, 128
    key = jax.random.PRNGKey(1)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, Q, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(kv_, (B, S, H, D), jnp.bfloat16)
    starts = jnp.array([0, 128], jnp.int32)
    ends = jnp.array([768, 640], jnp.int32)
    kv_valid = ((jnp.arange(S)[None] >= starts[:, None])
                & (jnp.arange(S)[None] < ends[:, None]))
    ref = dot_product_attention(q, k, v, kv_valid=kv_valid, causal=True,
                                q_offset=S - Q, impl="xla")
    out = jax.jit(lambda *a: flash_attention(
        a[0], a[1], a[2], starts=a[3], ends=a[4], q_offset=S - Q,
        causal=True))(q, k, v, starts, ends)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    assert err.max() < 0.06, err.max()


def test_flash_attention_backward():
    """Mosaic flash bwd (custom VJP) vs XLA VJP on a training shape."""
    from seedx_tpu.ops.attention import dot_product_attention
    from seedx_tpu.ops.flash_attention import flash_attention

    B, S, H, D = 2, 384, 4, 128
    key = jax.random.PRNGKey(2)
    kq, kk, kv_, kg = jax.random.split(key, 4)
    q = jax.random.normal(kq, (B, S, H, D), jnp.float32)
    k = jax.random.normal(kk, (B, S, H, D), jnp.float32)
    v = jax.random.normal(kv_, (B, S, H, D), jnp.float32)
    ct = jax.random.normal(kg, (B, S, H, D), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q.astype(jnp.bfloat16),
                                       k.astype(jnp.bfloat16),
                                       v.astype(jnp.bfloat16),
                                       causal=True).astype(jnp.float32) * ct)

    def loss_xla(q, k, v):
        return jnp.sum(dot_product_attention(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), causal=True,
            impl="xla").astype(jnp.float32) * ct)

    g_fl = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(q, k, v)
    for a, b, name in zip(g_fl, g_ref, "qkv"):
        scale = np.abs(np.asarray(b)).max() + 1e-6
        err = np.abs(np.asarray(a) - np.asarray(b)).max() / scale
        assert err < 0.05, (name, err)


def test_int4_matmul_kernels_match_xla_oracle():
    """W4A8 Pallas kernels (per-layer grid + stacked-layer decode) vs the
    XLA unpack+dot oracle.  The W4A8 activation quantization adds ~0.4%
    rounding on top of the shared int4 weights — bound it vs output RMS."""
    from seedx_tpu.ops.int4_matmul import (int4_matmul, int4_matmul_stacked,
                                           int4_matmul_xla)
    from seedx_tpu.utils.quantize import quantize_kernel_int4

    n_in, n_out, L, group = 1024, 1536, 3, 128
    key = jax.random.PRNGKey(3)
    kw, kx = jax.random.split(key)
    w = jax.random.normal(kw, (L, n_in, n_out), jnp.float32) * 0.02
    x = jax.random.normal(kx, (16, n_in), jnp.bfloat16)
    packed_np, scale_np = quantize_kernel_int4(np.asarray(w), group=group)
    packed, scale = jnp.asarray(packed_np), jnp.asarray(scale_np)

    ref1 = np.asarray(int4_matmul_xla(x, packed[1], scale[1], group=group),
                      np.float32)
    rms = float(np.sqrt((ref1 ** 2).mean())) + 1e-6

    y_grid = np.asarray(
        jax.jit(lambda x: int4_matmul(x, packed[1], scale[1], group=group))(
            x), np.float32)
    assert np.abs(y_grid - ref1).max() / rms < 0.05

    y_stacked = np.asarray(jax.jit(
        lambda x, li: int4_matmul_stacked(x, packed, scale, li, group=group)
    )(x, jnp.int32(1)), np.float32)
    assert np.abs(y_stacked - ref1).max() / rms < 0.05
    # the two kernels share the W4A8 path bit-for-bit
    assert np.array_equal(y_grid, y_stacked)


def test_int8_kv_roundtrip():
    """quantize_kv per-(position, head) scales: the serving KV-cache
    contract.  Error budget per element = 0.5 LSB from round-to-nearest
    PLUS up to 127*2^-9 ~= 0.25 LSB because the returned scale is stored
    in bf16 (llama.py quantize_kv) while q was rounded with the fp32
    scale — total < 0.78 LSB of each row's amax."""
    from seedx_tpu.models.llama import quantize_kv

    x = jax.random.normal(jax.random.PRNGKey(4), (4, 64, 8, 128),
                          jnp.bfloat16)
    q, s = jax.jit(quantize_kv)(x)
    deq = np.asarray(q, np.float32) * np.asarray(s, np.float32)
    err = np.abs(deq - np.asarray(x, np.float32))
    bound = np.abs(np.asarray(x, np.float32)).max(-1, keepdims=True)
    assert (err <= bound / 127.0 * 0.78 + 1e-6).all()


def test_ragged_dense_bf16(ragged_case):
    from seedx_tpu.ops.decode_attention import ragged_decode_attention

    c = ragged_case
    B, S, HKV, D = c["B"], c["S"], c["HKV"], c["D"]
    L = 3
    kc = jnp.zeros((L, B, S, HKV * D), jnp.bfloat16).at[1].set(
        c["k"].reshape(B, S, -1))
    vc = jnp.zeros((L, B, S, HKV * D), jnp.bfloat16).at[1].set(
        c["v"].reshape(B, S, -1))
    out = jax.jit(lambda *a: ragged_decode_attention(
        *a, layer=jnp.int32(1), kv_heads=HKV))(
            c["q"], kc, vc, c["starts"], c["ends"])
    assert np.abs(np.asarray(out, np.float32) - c["ref"]).max() < 0.06


def _quantized_case(c):
    from seedx_tpu.models.llama import quantize_kv

    B, S, HKV = c["B"], c["S"], c["HKV"]
    kq8, ks8 = quantize_kv(c["k"])
    vq8, vs8 = quantize_kv(c["v"])
    return (kq8.reshape(B, S, -1), vq8.reshape(B, S, -1),
            ks8.reshape(B, S, HKV).astype(jnp.bfloat16),
            vs8.reshape(B, S, HKV).astype(jnp.bfloat16))


def test_ragged_dense_int8(ragged_case):
    from seedx_tpu.ops.decode_attention import ragged_decode_attention

    c = ragged_case
    B, S, HKV, D = c["B"], c["S"], c["HKV"], c["D"]
    L, sw = 3, 128
    kq8, vq8, ks8, vs8 = _quantized_case(c)
    kcq = jnp.zeros((L, B, S, HKV * D), jnp.int8).at[1].set(kq8)
    vcq = jnp.zeros((L, B, S, HKV * D), jnp.int8).at[1].set(vq8)
    kss = jnp.zeros((L, B, S, sw), jnp.bfloat16).at[1, :, :, :HKV].set(ks8)
    vss = jnp.zeros((L, B, S, sw), jnp.bfloat16).at[1, :, :, :HKV].set(vs8)
    out = jax.jit(lambda *a: ragged_decode_attention(
        a[0], a[1], a[2], a[3], a[4], k_scale=a[5], v_scale=a[6],
        layer=jnp.int32(1), kv_heads=HKV))(
            c["q"], kcq, vcq, c["starts"], c["ends"], kss, vss)
    assert np.abs(np.asarray(out, np.float32) - c["ref"]).max() < 0.12


def test_ragged_paged_int8(ragged_case):
    from seedx_tpu.ops.decode_attention import ragged_decode_attention

    c = ragged_case
    B, S, HKV, D = c["B"], c["S"], c["HKV"], c["D"]
    L, sw, block = 3, 128, 64
    n_tiles = S // block
    pool_tiles = B * n_tiles + 1
    perm = np.random.RandomState(0).permutation(B * n_tiles) + 1
    tables = jnp.asarray(perm.reshape(B, n_tiles), jnp.int32)
    kq8, vq8, ks8, vs8 = _quantized_case(c)
    pool_k = np.zeros((L, pool_tiles * block, HKV * D), np.int8)
    pool_v = np.zeros((L, pool_tiles * block, HKV * D), np.int8)
    pool_ks = np.zeros((L, pool_tiles * block, sw), np.float32)
    pool_vs = np.zeros((L, pool_tiles * block, sw), np.float32)
    kq8n, vq8n = np.asarray(kq8), np.asarray(vq8)
    ks8n = np.asarray(ks8, np.float32)
    vs8n = np.asarray(vs8, np.float32)
    for bi in range(B):
        for j in range(n_tiles):
            t = int(tables[bi, j])
            sl = slice(t * block, (t + 1) * block)
            src = slice(j * block, (j + 1) * block)
            pool_k[1, sl] = kq8n[bi, src]
            pool_v[1, sl] = vq8n[bi, src]
            pool_ks[1, sl, :HKV] = ks8n[bi, src]
            pool_vs[1, sl, :HKV] = vs8n[bi, src]
    out = jax.jit(lambda *a: ragged_decode_attention(
        a[0], a[1], a[2], a[3], a[4], k_scale=a[5], v_scale=a[6],
        block_tables=a[7], layer=jnp.int32(1), kv_heads=HKV,
        block=block))(
            c["q"], jnp.asarray(pool_k), jnp.asarray(pool_v),
            c["starts"], c["ends"], jnp.asarray(pool_ks, jnp.bfloat16),
            jnp.asarray(pool_vs, jnp.bfloat16), tables)
    assert np.abs(np.asarray(out, np.float32) - c["ref"]).max() < 0.12
