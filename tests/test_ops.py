import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedx_tpu.ops.attention import dot_product_attention, make_attention_bias
from seedx_tpu.ops.norms import rms_norm
from seedx_tpu.ops.rope import apply_rope, rope_cos_sin


def test_rms_norm_matches_manual():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 8), jnp.float32)
    w = jnp.ones((8,)) * 2.0
    out = rms_norm(x, w, eps=1e-6)
    expected = 2.0 * x / np.sqrt(np.mean(np.asarray(x) ** 2, -1, keepdims=True) + 1e-6)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4)


def test_rope_norm_preserving_and_relative():
    # RoPE is a rotation: it preserves per-pair norms, and q.k depends only on
    # relative position.
    hd = 8
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 1, hd))
    cos, sin = rope_cos_sin(jnp.arange(4)[None], hd)
    q_rot = apply_rope(q, cos, sin)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(q_rot), axis=-1),
        np.linalg.norm(np.asarray(q), axis=-1), rtol=1e-5)

    k = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 1, hd))
    k_rot = apply_rope(k, cos, sin)
    # dot(q_i, k_j) should equal dot at shifted positions with same delta
    cos2, sin2 = rope_cos_sin(jnp.arange(4)[None] + 7, hd)
    q2 = apply_rope(q, cos2, sin2)
    k2 = apply_rope(k, cos2, sin2)
    d1 = np.asarray(jnp.einsum("bshd,bthd->st", q_rot, k_rot))
    d2 = np.asarray(jnp.einsum("bshd,bthd->st", q2, k2))
    np.testing.assert_allclose(d1, d2, rtol=1e-4, atol=1e-4)


def test_attention_causal_masks_future():
    b, s, h, d = 1, 8, 2, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (b, s, h, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, h, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, h, d))
    out = dot_product_attention(q, k, v, causal=True, impl="xla")
    # Row 0 attends only to position 0 -> equals v[0]
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(v[0, 0]),
                               rtol=1e-4, atol=1e-5)


def test_attention_kv_valid_ignores_padding():
    b, s, h, d = 2, 8, 2, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (b, s, h, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, h, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, h, d))
    valid = jnp.arange(s)[None, :] < 5
    out_masked = dot_product_attention(q, k, v, kv_valid=valid, impl="xla")
    # Same as truncating kv to 5
    out_trunc = dot_product_attention(q, k[:, :5], v[:, :5], impl="xla")
    np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_trunc),
                               rtol=1e-4, atol=1e-5)


def test_attention_bias_q_offset_prefill_alignment():
    # Prefill into larger cache: q_offset=0 must forbid q row 0 from seeing
    # kv col 1 even though kv_len > q_len.
    bias = make_attention_bias(None, q_len=2, kv_len=4, causal=True, q_offset=0)
    bias = np.asarray(bias[0, 0])
    assert bias[0, 0] == 0.0 and bias[0, 1] < -1e30
    assert bias[1, 1] == 0.0 and bias[1, 2] < -1e30


def test_gqa_broadcast():
    b, s, d = 1, 8, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (b, s, 4, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, 2, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, 2, d))
    out = dot_product_attention(q, k, v, impl="xla")
    assert out.shape == (b, s, 4, d)


def test_flash_attention_matches_xla():
    # runs everywhere: pallas interpret mode on CPU, real kernel on TPU
    from seedx_tpu.ops.flash_attention import flash_attention

    b, s, h, d = 2, 512, 4, 128
    q = jax.random.normal(jax.random.PRNGKey(0), (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, h, d), jnp.bfloat16)
    lengths = jnp.array([512, 300], jnp.int32)
    kv_valid = jnp.arange(s)[None, :] < lengths[:, None]
    ref = dot_product_attention(q, k, v, kv_valid=kv_valid, causal=True,
                                impl="xla")
    fl = flash_attention(q, k, v, lengths=lengths, causal=True)
    mask = np.asarray(kv_valid)[:, :, None, None]
    diff = np.abs(np.asarray(ref, np.float32) - np.asarray(fl, np.float32))
    assert np.max(diff * mask) < 0.03


def test_flash_attention_window_and_prefill_offset():
    """Window masks (left-padded prompts) + prefill-into-cache q_offset."""
    from seedx_tpu.ops.flash_attention import flash_attention

    b, h, d = 2, 4, 128
    P, K = 384, 640
    q = jax.random.normal(jax.random.PRNGKey(0), (b, P, h, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, K, h, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, K, h, d), jnp.bfloat16)
    starts = jnp.array([50, 0], jnp.int32)
    ends = jnp.array([384, 300], jnp.int32)
    pos = jnp.arange(K)[None, :]
    kv_valid = (pos >= starts[:, None]) & (pos < ends[:, None])

    ref = dot_product_attention(q, k, v, kv_valid=kv_valid, causal=True,
                                q_offset=0, impl="xla")
    fl = flash_attention(q, k, v, starts=starts, ends=ends, q_offset=0,
                         causal=True)
    qpos = jnp.arange(P)[None, :]
    qmask = np.asarray((qpos >= starts[:, None])
                       & (qpos < ends[:, None]))[:, :, None, None]
    diff = np.abs(np.asarray(ref, np.float32) - np.asarray(fl, np.float32))
    assert (diff * qmask).max() < 0.03
    # Left-padded rows (q_pos < start: causal x window mask empty) must be
    # exactly zero even when their k-loop range is non-empty because other
    # rows in the tile keep it running — round-1 advisor finding on the fwd
    # kernel (p = exp(NEG_INF - NEG_INF) = 1 garbage without the guard).
    padmask = np.asarray(qpos < starts[:, None])[:, :, None, None]
    assert np.abs(np.asarray(fl, np.float32) * padmask).max() == 0.0


def test_flash_attention_partitions_on_mesh():
    """The flash kernel must shard over (batch, heads) instead of
    all-gathering (custom_partitioning + shardy rule; the known round-1 gap
    where TP inference fell back to impl='xla')."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from seedx_tpu.ops.attention import make_attention_bias, _xla_attention
    from seedx_tpu.ops.flash_attention import flash_attention

    devs = np.array(jax.devices()).reshape(2, 4)
    mesh = Mesh(devs, ("data", "tensor"))
    b, s, h, d = 4, 256, 8, 128
    q = jax.random.normal(jax.random.PRNGKey(0), (b, s, h, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, h, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, h, d), jnp.float32)
    starts = jnp.array([0, 5, 0, 37], jnp.int32)
    ends = jnp.array([256, 256, 120, 200], jnp.int32)

    sh = NamedSharding(mesh, P("data", None, "tensor", None))
    vsh = NamedSharding(mesh, P("data"))
    args = (jax.device_put(q, sh), jax.device_put(k, sh),
            jax.device_put(v, sh), jax.device_put(starts, vsh),
            jax.device_put(ends, vsh))

    f = jax.jit(lambda q, k, v, s, e: flash_attention(
        q, k, v, starts=s, ends=e, causal=True))
    out = f(*args)
    # stays sharded — the partitioner accepted the per-shard kernel
    assert out.sharding.spec[0] == "data"

    pos = jnp.arange(s)[None, :]
    kv_valid = (pos >= starts[:, None]) & (pos < ends[:, None])
    bias = make_attention_bias(kv_valid, s, s, True)
    ref = _xla_attention(q, k, v, bias, d ** -0.5)
    qpos = np.arange(s)[None, :]
    valid_row = ((qpos >= np.asarray(starts)[:, None])
                 & (qpos < np.asarray(ends)[:, None]))
    diff = np.abs(np.asarray(out) - np.asarray(ref))
    assert diff[valid_row].max() < 2e-5


def test_flash_attention_backward_matches_xla_vjp():
    """Pallas flash-2 backward (dq + dk/dv kernels) vs the XLA attention vjp.

    Upstream grads are zeroed on invalid q rows (they are loss-masked in real
    training); on valid positions the two backends must agree.
    """
    from seedx_tpu.ops.attention import make_attention_bias, _xla_attention
    from seedx_tpu.ops.flash_attention import flash_attention

    b, h, d = 2, 4, 128
    for q_len, kv_len, starts, ends, q_offset, causal in [
        (256, 256, None, [256, 170], None, True),      # right-pad training
        (256, 256, [30, 0], [256, 200], None, True),   # left-pad window
        (256, 512, [0, 10], [256, 200], 0, True),      # prefill into cache
        (256, 256, [0, 5], [256, 180], None, False),   # non-causal (ViT)
    ]:
        keys = jax.random.split(jax.random.PRNGKey(0), 4)
        q = jax.random.normal(keys[0], (b, q_len, h, d), jnp.float32)
        k = jax.random.normal(keys[1], (b, kv_len, h, d), jnp.float32)
        v = jax.random.normal(keys[2], (b, kv_len, h, d), jnp.float32)
        g = jax.random.normal(keys[3], (b, q_len, h, d), jnp.float32)
        starts_a = (jnp.zeros((b,), jnp.int32) if starts is None
                    else jnp.asarray(starts, jnp.int32))
        ends_a = jnp.asarray(ends, jnp.int32)
        qoff = q_offset if q_offset is not None else kv_len - q_len
        qpos = jnp.arange(q_len)[None, :] + qoff
        row_valid = (qpos >= starts_a[:, None]) & (qpos < ends_a[:, None])
        g = g * row_valid[:, :, None, None]

        def f_flash(q, k, v):
            out = flash_attention(q, k, v, starts=starts, ends=ends,
                                  q_offset=q_offset, causal=causal)
            return (out * g).sum()

        def f_ref(q, k, v):
            pos = jnp.arange(kv_len)[None, :]
            kv_valid = (pos >= starts_a[:, None]) & (pos < ends_a[:, None])
            bias = make_attention_bias(kv_valid, q_len, kv_len, causal,
                                       q_offset=q_offset)
            return (_xla_attention(q, k, v, bias, d ** -0.5) * g).sum()

        gf = jax.jit(jax.grad(f_flash, argnums=(0, 1, 2)))(q, k, v)
        gr = jax.jit(jax.grad(f_ref, argnums=(0, 1, 2)))(q, k, v)
        # MXU default precision truncates fp32 dots to bf16 on TPU; CPU
        # interpret mode is exact.
        tol = 1e-2 if jax.default_backend() == "tpu" else 2e-4
        for name, a, r in zip("qkv", gf, gr):
            rel = (np.abs(np.asarray(a) - np.asarray(r)).max()
                   / (np.abs(np.asarray(r)).max() + 1e-9))
            assert rel < tol, (q_len, kv_len, causal, name, rel)
