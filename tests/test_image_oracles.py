"""Numerical oracles for the image stack: the reference's own torch modules
(imported from /root/reference, see tests/oracles.py) drive random weights
through BOTH implementations and assert activation parity through the weight
converters.

Round-1 gap (VERDICT): the ViT trunk and detokenizer resampler tests were
shape-only / hand-built; these tests verify the converter + model math
end-to-end against the actual reference classes
(reference: qwen_visual.py:325-459, detokenizer/resampler.py:226-286).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from seedx_tpu.utils import weights as W

from oracles import load_reference_detok_resampler, load_reference_qwen_visual


def _maxdiff(a, b):
    return float(np.max(np.abs(np.asarray(a, np.float32)
                               - np.asarray(b, np.float32))))


# ---------------------------------------------------------------------------
# De-tokenizer resampler (ResamplerXLV2)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("normalize", [False, True])
def test_detok_resampler_matches_reference(normalize):
    ref_mod = load_reference_detok_resampler()
    torch.manual_seed(0)
    ref = ref_mod.ResamplerXLV2(
        dim=64, depth=2, dim_head=16, heads=4, num_queries=16,
        embedding_dim=48, output1_dim=24, output2_dim=40, ff_mult=2,
        normalize=normalize).eval().float()

    x = torch.randn(2, 10, 48)
    with torch.no_grad():
        ref_prompt, ref_pooled = ref(x)

    from seedx_tpu.models.detokenizer import DetokenizerConfig, ResamplerXL

    params = W.convert_detokenizer_resampler(ref.state_dict(), depth=2,
                                             prefix="")
    cfg = DetokenizerConfig(dim=64, depth=2, dim_head=16, heads=4,
                            num_queries=16, embedding_dim=48, output1_dim=24,
                            output2_dim=40, ff_mult=2, normalize=normalize,
                            dtype=jnp.float32)
    prompt, pooled = ResamplerXL(cfg).apply({"params": params},
                                            jnp.asarray(x.numpy()))
    assert _maxdiff(prompt, ref_prompt.numpy()) < 1e-4
    assert _maxdiff(pooled, ref_pooled.numpy()) < 1e-4


# ---------------------------------------------------------------------------
# Qwen ViT trunk + attention pool (VisionTransformerWithAttnPool)
# ---------------------------------------------------------------------------

def _ref_vit(qv, **kw):
    torch.manual_seed(1)
    return qv.VisionTransformerWithAttnPool(**kw).eval().float()


@pytest.mark.parametrize("patch_pos", [False, True])
def test_vit_trunk_matches_reference(patch_pos):
    """Full trunk parity: conv patchify, pos embed (no-resize geometry),
    pre-LN blocks with the reference's per-head-interleaved qkv packing,
    attention pool, patch-pos embedding, ln_post + proj."""
    qv = load_reference_qwen_visual()
    # 16 tokens; reference stores a 256-row pos table and interpolates ->
    # patch the table to 16 rows so this test isolates the trunk math from
    # the interpolation kernel (tested separately below).
    ref = _ref_vit(qv, image_size=56, patch_size=14, width=64, layers=2,
                   heads=4, mlp_ratio=2.0, n_queries=16, output_dim=128,
                   patch_pos=patch_pos)
    with torch.no_grad():
        ref.positional_embedding = torch.nn.Parameter(
            torch.randn(16, 64) * 64 ** -0.5)

    imgs = torch.randn(2, 3, 56, 56)
    ppos = torch.tensor([[0.25, 0.5], [0.0, 1.0]]) if patch_pos else None
    with torch.no_grad():
        expected = ref(imgs, ppos).numpy()

    from seedx_tpu.models.vit import ViTConfig, VisionTransformer

    params = W.convert_qwen_vit(ref.state_dict(), num_layers=2, num_heads=4)
    cfg = ViTConfig(image_size=56, patch_size=14, width=64, layers=2,
                    heads=4, mlp_ratio=2.0, n_queries=16, output_dim=128,
                    patch_pos=patch_pos, pos_embed_len=16, dtype=jnp.float32)
    out = VisionTransformer(cfg, remat=False).apply(
        {"params": params},
        jnp.asarray(imgs.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(ppos.numpy()) if ppos is not None else None)
    assert _maxdiff(out, expected) < 2e-4


def test_pos_embed_resize_matches_reference_bicubic():
    """The 256-row stored table interpolates to the token grid with torch's
    bicubic (a=-0.75, align_corners=False) — reference get_abs_pos
    (qwen_visual.py:24-40). The flagship runs this at 256->1024 every
    forward, so the kernel must match torch, not jax.image's Keys cubic."""
    qv = load_reference_qwen_visual()
    torch.manual_seed(2)
    table = torch.randn(256, 32)
    for tgt in (16, 1024):
        expected = qv.get_abs_pos(table, tgt).numpy()

        from seedx_tpu.models.resampler import resize_pos_embed

        got = np.asarray(resize_pos_embed(jnp.asarray(table.numpy()), tgt))
        assert _maxdiff(got, expected) < 1e-4, tgt
