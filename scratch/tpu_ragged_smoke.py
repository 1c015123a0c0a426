"""On-chip (NON-interpret) parity smoke of ops/decode_attention.py.

The pytest run of tests/test_decode_attention.py is CPU/interpret by
conftest design; this script is the real Mosaic compile + numerics check
the r2 verdict asked for (VERDICT "What's weak" #2/#6).  Run it on the
TPU queue: ``python scratch/tpu_ragged_smoke.py``.

Covers: bf16 + int8 KV, dense stacked [L,B,S,*] and paged pool modes, at a
serving-like geometry (kv_heads*head_dim % 128 == 0), parity vs an fp32
XLA reference over the same [start, end) windows.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from seedx_tpu.models.llama import quantize_kv
from seedx_tpu.ops.decode_attention import ragged_decode_attention


def xla_ref(q, k, v, starts, ends, scale):
    """fp32 masked attention over [start, end) windows. q [B,Hq,D],
    k/v [B,S,Hkv,D]."""
    b, hq, d = q.shape
    s = k.shape[1]
    hkv = k.shape[2]
    g = hq // hkv
    qf = q.astype(jnp.float32).reshape(b, hkv, g, d)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    logits = jnp.einsum("bhgd,bshd->bhgs", qf, kf) * scale
    pos = jnp.arange(s)[None, :]
    mask = (pos >= starts[:, None]) & (pos < ends[:, None])
    logits = jnp.where(mask[:, None, None, :], logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgs,bshd->bhgd", p, vf)
    return out.reshape(b, hq, d)


def main():
    if "--cpu" not in sys.argv:   # logic self-check runs interpret on CPU
        assert jax.default_backend() == "tpu", jax.default_backend()
    B, S, HKV, G, D = 8, 1280, 4, 10, 128   # f = 512, 13B-like GQA shape
    HQ = HKV * G
    scale = D ** -0.5
    key = jax.random.PRNGKey(0)
    kq, kk, kv_, kw = jax.random.split(key, 4)
    q = jax.random.normal(kq, (B, HQ, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, S, HKV, D), jnp.bfloat16)
    v = jax.random.normal(kv_, (B, S, HKV, D), jnp.bfloat16)
    starts = jnp.array([0, 64, 128, 0, 320, 512, 96, 768], jnp.int32)
    ends = jnp.array([1280, 512, 640, 96, 352, 1280, 128, 1024], jnp.int32)

    ref = np.asarray(jax.jit(xla_ref, static_argnums=5)(
        q, k, v, starts, ends, scale), np.float32)

    failures = 0

    def check(name, out, atol):
        nonlocal failures
        err = np.abs(np.asarray(out, np.float32) - ref).max()
        ok = err < atol
        failures += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'} {name}: max_err={err:.4f} "
              f"(atol {atol})")

    # ---- dense bf16, stacked layer axis (the standing-buffer contract) ----
    L = 3
    kc = jnp.zeros((L, B, S, HKV * D), jnp.bfloat16)
    vc = jnp.zeros((L, B, S, HKV * D), jnp.bfloat16)
    kc = kc.at[1].set(k.reshape(B, S, -1))
    vc = vc.at[1].set(v.reshape(B, S, -1))
    out = jax.jit(lambda *a: ragged_decode_attention(
        *a, layer=jnp.int32(1), kv_heads=HKV))(q, kc, vc, starts, ends)
    check("dense bf16 stacked", out, 0.06)

    # ---- dense int8 + lane-padded scales ----
    kq8, ks8 = quantize_kv(k)
    vq8, vs8 = quantize_kv(v)
    sw = 128
    kcq = jnp.zeros((L, B, S, HKV * D), jnp.int8).at[1].set(
        kq8.reshape(B, S, -1))
    vcq = jnp.zeros((L, B, S, HKV * D), jnp.int8).at[1].set(
        vq8.reshape(B, S, -1))
    kss = jnp.zeros((L, B, S, sw), jnp.bfloat16).at[1, :, :, :HKV].set(
        ks8.reshape(B, S, HKV).astype(jnp.bfloat16))
    vss = jnp.zeros((L, B, S, sw), jnp.bfloat16).at[1, :, :, :HKV].set(
        vs8.reshape(B, S, HKV).astype(jnp.bfloat16))
    out = jax.jit(lambda *a: ragged_decode_attention(
        a[0], a[1], a[2], a[3], a[4], k_scale=a[5], v_scale=a[6],
        layer=jnp.int32(1), kv_heads=HKV))(
            q, kcq, vcq, starts, ends, kss, vss)
    check("dense int8 stacked", out, 0.12)

    # ---- paged int8 pool + block tables ----
    block = 64
    n_tiles = S // block
    pool_tiles = B * n_tiles + 1
    perm = np.random.RandomState(0).permutation(B * n_tiles) + 1
    tables = jnp.asarray(perm.reshape(B, n_tiles), jnp.int32)
    pool_k = jnp.zeros((L, pool_tiles * block, HKV * D), jnp.int8)
    pool_v = jnp.zeros((L, pool_tiles * block, HKV * D), jnp.int8)
    pool_ks = jnp.zeros((L, pool_tiles * block, sw), jnp.bfloat16)
    pool_vs = jnp.zeros((L, pool_tiles * block, sw), jnp.bfloat16)
    for bi in range(B):
        for j in range(n_tiles):
            t = int(tables[bi, j])
            sl = slice(t * block, (t + 1) * block)
            src = slice(j * block, (j + 1) * block)
            pool_k = pool_k.at[1, sl].set(kq8.reshape(B, S, -1)[bi, src])
            pool_v = pool_v.at[1, sl].set(vq8.reshape(B, S, -1)[bi, src])
            pool_ks = pool_ks.at[1, sl, :HKV].set(
                ks8.reshape(B, S, HKV)[bi, src].astype(jnp.bfloat16))
            pool_vs = pool_vs.at[1, sl, :HKV].set(
                vs8.reshape(B, S, HKV)[bi, src].astype(jnp.bfloat16))
    out = jax.jit(lambda *a: ragged_decode_attention(
        a[0], a[1], a[2], a[3], a[4], k_scale=a[5], v_scale=a[6],
        block_tables=a[7], layer=jnp.int32(1), kv_heads=HKV,
        block=block))(q, pool_k, pool_v, starts, ends, pool_ks, pool_vs,
                      tables)
    check("paged int8 stacked", out, 0.12)

    print("RAGGED_SMOKE", "FAILED" if failures else "OK")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
