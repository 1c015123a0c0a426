import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedx_tpu.models.resampler import (Resampler, resize_pos_embed,
                                        sincos_2d_pos_embed)
from seedx_tpu.models.vit import VisionTransformer, vit_downsample


def test_sincos_pos_embed_shape_and_range():
    pos = sincos_2d_pos_embed(64, 4)
    assert pos.shape == (16, 64)
    assert np.all(np.abs(pos) <= 1.0 + 1e-6)


def test_resize_pos_embed_identity_and_resize():
    pos = jnp.asarray(sincos_2d_pos_embed(16, 4), jnp.float32)
    assert resize_pos_embed(pos, 16) is pos
    out = resize_pos_embed(pos, 64)
    assert out.shape == (64, 16)


def test_resampler_shapes():
    model = Resampler(grid_size=2, embed_dim=32, num_heads=4, kv_dim=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 9, 16))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (3, 4, 32)


def test_vit_forward(tiny_vit_cfg):
    model = VisionTransformer(tiny_vit_cfg)
    images = jax.random.normal(jax.random.PRNGKey(0), (2, 56, 56, 3))
    variables = model.init(jax.random.PRNGKey(0), images)
    out = model.apply(variables, images)
    assert out.shape == (2, tiny_vit_cfg.n_queries, tiny_vit_cfg.output_dim)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_vit_patch_pos(tiny_vit_cfg):
    import dataclasses

    cfg = dataclasses.replace(tiny_vit_cfg, patch_pos=True)
    model = VisionTransformer(cfg)
    images = jax.random.normal(jax.random.PRNGKey(0), (2, 56, 56, 3))
    pp = jnp.array([[0.25, 0.25], [0.75, 0.75]])
    variables = model.init(jax.random.PRNGKey(0), images, pp)
    out = model.apply(variables, images, pp)
    out2 = model.apply(variables, images, 1 - pp)
    # different tile positions must change the output
    assert float(jnp.max(jnp.abs(out - out2))) > 0


def test_vit_downsample():
    x = jnp.arange(2 * 8 * 4, dtype=jnp.float32).reshape(2, 8, 4)
    out = vit_downsample(x, pool=4)
    assert out.shape == (2, 2, 4)
    np.testing.assert_allclose(np.asarray(out[0, 0]),
                               np.asarray(jnp.mean(x[0, :4], axis=0)))
