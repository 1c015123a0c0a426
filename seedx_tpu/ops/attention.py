"""Attention dispatch: XLA reference path + Pallas flash path.

Replaces xformers ``memory_efficient_attention`` from the reference LLaMA
backbone (reference: src/models/mllm/modeling_llama_xformer.py:24,225-237).

Layout convention everywhere: ``[batch, seq, heads, head_dim]``.

``impl``:
  * ``"xla"``   — einsum + fp32 softmax; XLA fuses and tiles this well and it
    runs on any backend (used by tests on the CPU mesh).
  * ``"flash"`` — Pallas blockwise flash-attention kernel (TPU only); exact,
    O(seq) memory.
  * ``"auto"``  — flash on TPU when the mask is expressible as
    (causal, per-sequence kv length), else xla.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def make_attention_bias(
    kv_valid: Optional[jnp.ndarray],
    q_len: int,
    kv_len: int,
    causal: bool,
    dtype=jnp.float32,
    q_offset=None,
) -> Optional[jnp.ndarray]:
    """Additive bias [batch|1, 1, q_len, kv_len] from a kv validity mask.

    Args:
      kv_valid: [batch, kv_len] bool (True = attend) or None.
      causal: apply causal structure; query row i sits at kv position
        ``q_offset + i``.  Default offset aligns q to the kv tail (standard
        decode alignment); pass ``q_offset=cache_index`` when prefilling into
        a larger preallocated cache.  ``q_offset`` may be a [batch] vector —
        the continuous engine's fused prefill+decode step, where every slot
        writes its window at its own cache depth.
    """
    bias = None
    if causal:
        if q_offset is None:
            q_offset = kv_len - q_len
        k_pos = jnp.arange(kv_len)[None, :]
        if getattr(q_offset, "ndim", 0) == 1:      # per-row offsets [batch]
            q_pos = (jnp.arange(q_len)[None, :]
                     + q_offset[:, None])                   # [batch, q]
            causal_mask = q_pos[:, :, None] >= k_pos[None]  # [batch, q, kv]
            bias = jnp.where(causal_mask, 0.0,
                             NEG_INF)[:, None].astype(dtype)
        else:
            q_pos = jnp.arange(q_len)[:, None] + q_offset
            causal_mask = q_pos >= k_pos  # [q, kv]
            bias = jnp.where(causal_mask, 0.0,
                             NEG_INF)[None, None].astype(dtype)
    if kv_valid is not None:
        pad = jnp.where(kv_valid[:, None, None, :], 0.0, NEG_INF).astype(dtype)
        bias = pad if bias is None else bias + pad
    return bias


def _xla_attention(q, k, v, bias, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out.astype(q.dtype)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    bias: Optional[jnp.ndarray] = None,
    kv_valid: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    impl: str = "auto",
    q_offset=None,
) -> jnp.ndarray:
    """Multi-head attention.

    Args:
      q: [batch, q_len, heads, head_dim].
      k, v: [batch, kv_len, kv_heads, head_dim] (kv_heads divides heads).
      bias: optional additive bias [batch|1, heads|1, q_len, kv_len]; when
        given, forces the xla path.
      kv_valid: [batch, kv_len] bool mask of valid kv positions.
      causal: causal structure (q aligned to the kv tail).
      impl: "auto" | "xla" | "flash".
    """
    b, q_len, heads, head_dim = q.shape
    kv_len, kv_heads = k.shape[1], k.shape[2]
    if kv_heads != heads:  # grouped-query: broadcast kv heads
        rep = heads // kv_heads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    if scale is None:
        scale = head_dim ** -0.5

    use_flash = False
    if impl == "flash":
        use_flash = True
    elif impl == "auto":
        # flash handles training (q==kv) AND prefill-into-cache (kv > q with
        # an explicit q_offset); decode (q_len 1) stays on the xla path.
        # Odd head dims (ViT-bigG's 104) are zero-padded to the 128 lane
        # width: padding q/k leaves the logits unchanged and padded v
        # channels are sliced away — cheaper than materialising the fp32
        # [B, H, S, S] probs the xla path writes to HBM.  Ragged sequence
        # lengths (the reference's 880-token SFT batches) are zero-padded to
        # the 128 tile width below, so they no longer force the xla path.
        use_flash = (
            bias is None
            and jax.default_backend() == "tpu"
            and q_len >= 128
            and (q_len == kv_len or q_offset is not None)
            # the flash kernel takes one scalar q_offset; per-row offset
            # vectors (the fused prefill+decode step) stay on the xla path
            and getattr(q_offset, "ndim", 0) == 0
        )
    if use_flash:
        from seedx_tpu.ops.flash_attention import flash_attention

        starts = ends = None
        if kv_valid is not None:
            # kv_valid is a contiguous window in every caller (right-padded
            # training batches / left-padded generation prompts + cache tail)
            m = kv_valid.astype(jnp.int32)
            starts = jnp.argmax(m, axis=-1).astype(jnp.int32)
            ends = starts + jnp.sum(m, axis=-1)
        # A full-dim tail block is Mosaic-legal at any size, and head_dim 64
        # (SDXL UNet) measures 1.5-2.3x faster unpadded than padded to 128 —
        # pad only odd sizes (ViT-bigG's 104 -> 128, tiny debug dims -> 64).
        if head_dim % 128 == 0 or head_dim == 64:
            pad = 0
        elif head_dim < 64:
            pad = 64 - head_dim
        else:
            pad = (-head_dim) % 128
        if pad:
            widths = [(0, 0)] * 3 + [(0, pad)]
            q = jnp.pad(q, widths)
            k = jnp.pad(k, widths)
            v = jnp.pad(v, widths)
        # Seq padding: padded kv columns are masked via ends (default = the
        # pre-pad kv_len); padded q rows compute garbage that is sliced off.
        q_pad = (-q_len) % 128
        kv_pad = (-kv_len) % 128
        if kv_pad:
            if ends is None:
                starts = jnp.zeros((b,), jnp.int32)
                ends = jnp.full((b,), kv_len, jnp.int32)
            k = jnp.pad(k, [(0, 0), (0, kv_pad), (0, 0), (0, 0)])
            v = jnp.pad(v, [(0, 0), (0, kv_pad), (0, 0), (0, 0)])
        if q_pad:
            if q_offset is None:
                q_offset = kv_len - q_len  # pin alignment before padding
            q = jnp.pad(q, [(0, 0), (0, q_pad), (0, 0), (0, 0)])
        # non-causal (ViT/UNet): bk=512 measures ~17% over 256 (no masked
        # halves to waste work on) and bq=256 another ~20% at the SDXL
        # level-1 shape (4096 tokens, head_dim 64); causal keeps 256/256.
        bq, bk = (256, 256) if causal else (256, 512)
        out = flash_attention(q, k, v, starts=starts, ends=ends,
                              q_offset=q_offset, causal=causal, scale=scale,
                              block_q=bq, block_k=bk)
        if q_pad:
            out = out[:, :q_len]
        return out[..., :head_dim] if pad else out

    full_bias = bias
    extra = make_attention_bias(kv_valid, q_len, kv_len, causal, q_offset=q_offset)
    if extra is not None:
        full_bias = extra if full_bias is None else full_bias + extra
    return _xla_attention(q, k, v, full_bias, scale)
