"""Decode layer loop over scan-stacked int4 weights (seq==1 and fused).

Why this exists: ``LlamaModel`` runs its blocks under ``nn.scan``, which
dynamic-slices each layer's parameters out of the stacked arrays per
iteration.  For bf16/int8 weights XLA fuses that slice into the consuming
matmul, but the int4 path's Pallas kernel is a *custom call* — its operands
must be dense HBM buffers, so the slice materialises a fresh copy of every
packed block before every kernel launch.  Measured on the 13B geometry that
copy costs more than the matmuls themselves (~16 us per 13 MB block), and
B=1 decode lands at ~42% of the int4 weight-stream roofline (VERDICT r1 #4).

This module replaces the scan with a ``lax.fori_loop`` whose matmuls call
``ops.int4_matmul.int4_matmul_stacked``: the layer index rides into the
kernel as a scalar-prefetch argument and the BlockSpec index_map points the
pipeline's DMAs straight at layer ``li`` of the stacked array — the packed
bytes stream HBM->VMEM exactly once, no intermediate copy (measured 1.5x
on the full 13B layer loop, scratch/stacked_micro.py).

Two step shapes share the loop:

  * seq == 1 — the classic serving decode step (store-then-attend, int8 or
    bf16 KV cache, scalar or per-row cache offsets, optional LoRA deltas,
    ragged or XLA attention, optional paged block tables).
  * seq == w > 1 with ``write_widths`` — the FUSED prefill+decode step of
    the continuous engine (inference/continuous.py): row b's window slots
    [0, write_widths[b]) are real tokens (decoding rows use 1, prefilling
    rows up to w) written at [cache_index[b], ...); garbage slots scatter
    out of bounds (dropped).  Decode is weight-stream bound, so the extra
    window rows ride the same int4 stream — prompt prefill becomes nearly
    free instead of stalling every live slot for a full prompt-bucket
    forward (Sarathi-style chunked prefill).  Attention for the fused step
    is per-row-causal over the dense cache (XLA path).

``tests/test_quantize.py`` pins parity against the nn.scan path; prefill
and training keep the flax path.

Reference parity context: the reference serves fp16 with HF generate
(src/inference/eval_img2text_seed_x_i.py:61) — this whole quantized decode
engine has no reference counterpart.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from seedx_tpu.ops.attention import dot_product_attention
from seedx_tpu.ops.decode_attention import (_pick_block,
                                            ragged_decode_attention)
from seedx_tpu.ops.int4_matmul import int4_matmul_stacked
from seedx_tpu.ops.norms import rms_norm
from seedx_tpu.ops.rope import apply_rope


def _index(tree_leaf: jnp.ndarray, li: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.dynamic_index_in_dim(tree_leaf, li, keepdims=False)


def decode_layers_stacked(cfg, layer_params: Any, x: jnp.ndarray,
                          cos: jnp.ndarray, sin: jnp.ndarray,
                          kv_valid, cache: Tuple[jnp.ndarray, ...],
                          cache_index, *, block_tables=None,
                          write_widths=None,
                          interpret: bool = False
                          ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
    """Run all decoder layers for one step against stacked quantized params.

    Args:
      cfg: LlamaConfig (quantization == "int4").
      layer_params: the ``params["layers"]["layer"]`` subtree — every leaf
        scan-stacked with a leading ``num_layers`` axis.
      x: [batch, s, hidden] embeddings (s == 1, or s == w for the fused
        prefill+decode step with ``write_widths``).
      cos/sin: rope tables [batch, s, head_dim].
      kv_valid: [batch, kv_len] bool or None.
      cache: stacked KV cache ([L, b, max_len, f] x2, + scales x2 if int8);
        with ``block_tables`` a shared PAGED pool ([L, pool_rows, f] x2,
        + [L, pool_rows, nh] scales x2).
      cache_index: scalar write offset, or [batch] int32 per-row offsets
        (continuous batching).
      block_tables: [batch, n_tiles] int32 — logical KV tile j of row b
        lives at pool tile ``block_tables[b, j]`` (tile size =
        kv_len // n_tiles).  Paged rows require per-row offsets + ragged
        attention (vLLM-style serving; no reference counterpart).
      write_widths: [batch] int32 — fused step (see module docstring).
    Returns:
      (hidden [batch, s, hidden], new cache) — same contract as the scan.
    """
    b, s, hidden = x.shape
    mixed = s > 1
    if mixed:
        assert write_widths is not None, \
            "stacked decode with seq > 1 is the fused step (write_widths)"
        assert getattr(cache_index, "ndim", 0) == 1, \
            "fused step requires per-row cache offsets"
    nh, hd = cfg.num_kv_heads, cfg.head_dim
    per_row = getattr(cache_index, "ndim", 0) == 1
    int8_kv = len(cache) == 4
    paged = block_tables is not None
    rows_i = jnp.arange(b)

    # Ragged attention: stream only [start, end) KV rows per slot (the XLA
    # path below reads the full max_len cache every step — at 8 slots x
    # 1280 positions that read rivals the int4 weight stream itself).
    # Mixed (fused prefill+decode) steps use the kernel's MULTI-QUERY
    # window mode: the q window rides the same per-row DMA'd KV stream.
    if paged:
        assert per_row and kv_valid is not None, \
            "paged KV requires per-row offsets + kv windows"
        assert cfg.decode_attention != "never", \
            "paged KV requires the ragged attention kernel"
        kv_len = kv_valid.shape[1]
        n_tiles = block_tables.shape[1]
        assert kv_len % n_tiles == 0
        page = kv_len // n_tiles
        use_ragged = True
    else:
        max_len = cache[0].shape[2]
        f_flat = cfg.num_kv_heads * cfg.head_dim
        blk = _pick_block(max_len,
                          row_bytes=f_flat * cache[0].dtype.itemsize)
        # Mosaic alignment (ops/decode_attention.py): flat KV rows must be
        # 128-lane multiples, tiles must hit the dtype's sublane granule.
        # "auto" additionally requires batch >= 2: measured on a v5e chip
        # (r3, 13B int4/int8-KV geometry) ragged wins big at batch — B=8
        # 562 vs 361 tok/s (+56%) — but LOSES at B=1 (72.5 vs 82.1), where
        # one grid row can't hide the manual-DMA pipeline behind compute.
        granule = {1: 32, 2: 16, 4: 8}[cache[0].dtype.itemsize]
        use_ragged = (
            kv_valid is not None and cfg.decode_attention != "never"
            and blk >= 8
            and (cfg.decode_attention == "force"
                 or (jax.default_backend() == "tpu" and b >= 2
                     and f_flat % 128 == 0 and blk % granule == 0)))
        # mixed steps ride the kernel's multi-query window mode.  History:
        # the v1 window mode (per-row f32-HIGHEST segmented dots) sank
        # fused serving to 71.9 tok/s vs 261.9 legacy on-chip and mixed
        # steps were routed to the XLA path (itself only ~5% under ragged
        # at serving cache sizes, but its full-cache int8 dequant made
        # mixed chunks ~1.5x a decode chunk); the v3 bf16-operand kernel
        # (ops/decode_attention.py) shares one score matmul across the
        # window, so mixed ragged is back to ~decode cost.
    if use_ragged:
        m32 = kv_valid.astype(jnp.int32)
        starts = jnp.argmax(m32, axis=-1).astype(jnp.int32)
        ends = starts + jnp.sum(m32, axis=-1)
        if mixed:
            # multi-query stair contract (ops/decode_attention.py): query
            # slot i attends [start, ends+i); the engine's kv_valid covers
            # [start, pos + width), so the base end (slot 0) is that end
            # minus (width - 1)
            ends = ends - jnp.maximum(write_widths - 1, 0)

    def proj(name: str, h2: jnp.ndarray, li: jnp.ndarray) -> jnp.ndarray:
        p = layer_params[name]
        packed, scale = p["kernel_q4"], p["kernel_scale"]
        n_in = h2.shape[-1]
        group = n_in // scale.shape[1]
        y = int4_matmul_stacked(h2.astype(cfg.dtype), packed, scale, li,
                                group=group, interpret=interpret)
        if "lora_a" in p:
            a = _index(p["lora_a"], li).astype(cfg.dtype)
            bm = _index(p["lora_b"], li).astype(cfg.dtype)
            lscale = cfg.lora_alpha / cfg.lora_rank
            y = y + lscale * ((h2.astype(cfg.dtype) @ a) @ bm)
        return y

    if mixed:
        widx = cache_index[:, None] + jnp.arange(s)[None, :]     # [b, s]
        slot_ok = jnp.arange(s)[None, :] < write_widths[:, None]
        if paged:
            # resolve window positions through the block table; garbage
            # slots (and stair positions past the table) drop out of bounds
            col = widx // page
            in_range = slot_ok & (col < n_tiles)
            tiles = block_tables[rows_i[:, None],
                                 jnp.minimum(col, n_tiles - 1)]
            widx = jnp.where(in_range, tiles * page + widx % page,
                             cache[0].shape[1])      # pool rows -> OOB drop
        else:
            widx = jnp.where(slot_ok, widx,
                             cache[0].shape[2])      # garbage -> OOB drop
    elif paged:
        # physical pool row of each slot's current write position
        pool_rows = (block_tables[rows_i, cache_index // page] * page
                     + cache_index % page)                       # [b]

    def store(buf: jnp.ndarray, val: jnp.ndarray, li: jnp.ndarray
              ) -> jnp.ndarray:
        """Write val [b, s, f] into stacked buf [L, b, max_len, f] at
        (li, :, cache_index..) — or into the paged pool [L, pool_rows, f]
        at each slot's block-table-resolved physical row."""
        if mixed and paged:
            return buf.at[li, widx].set(val.astype(buf.dtype), mode="drop")
        if mixed:
            return buf.at[li, rows_i[:, None], widx].set(
                val.astype(buf.dtype), mode="drop")
        if paged:
            return buf.at[li, pool_rows].set(val[:, 0].astype(buf.dtype))
        if per_row:
            return buf.at[li, rows_i, cache_index].set(
                val[:, 0].astype(buf.dtype))
        return jax.lax.dynamic_update_slice(
            buf, val[None].astype(buf.dtype), (li, 0, cache_index, 0))

    def body(li, carry):
        x2, cache = carry                    # x2 [b*s, hidden]
        ln1 = _index(layer_params["input_layernorm"]["scale"], li)
        h = rms_norm(x2.astype(cfg.dtype), ln1.astype(cfg.dtype),
                     cfg.rms_eps)

        q = proj("q_proj", h, li).reshape(b, s, cfg.num_heads, hd)
        k = proj("k_proj", h, li).reshape(b, s, nh, hd)
        v = proj("v_proj", h, li).reshape(b, s, nh, hd)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        if int8_kv:
            from seedx_tpu.models.llama import quantize_kv

            ck, cv, ks, vs = cache
            sw = ks.shape[-1]              # lane-padded (kv_scale_width)
            kq, ksc = quantize_kv(k)
            vq, vsc = quantize_kv(v)
            ck = store(ck, kq.reshape(b, s, nh * hd), li)
            cv = store(cv, vq.reshape(b, s, nh * hd), li)
            ks = store(ks, jnp.pad(ksc.reshape(b, s, nh).astype(ks.dtype),
                                   ((0, 0), (0, 0), (0, sw - nh))), li)
            vs = store(vs, jnp.pad(vsc.reshape(b, s, nh).astype(vs.dtype),
                                   ((0, 0), (0, 0), (0, sw - nh))), li)
            cache = (ck, cv, ks, vs)
            if use_ragged:
                # the standing stacked buffers go to the kernel whole (a
                # sliced pallas operand would copy the layer to HBM first);
                # HBM reads stay int8 + tiny scales, window-bounded
                attn = ragged_decode_attention(
                    q if mixed else q[:, 0], ck, cv, starts, ends,
                    k_scale=ks, v_scale=vs,
                    block_tables=block_tables, layer=li, kv_heads=nh,
                    block=page if paged else 0, interpret=interpret)
                attn = attn.reshape(b * s, cfg.num_heads * hd)
            else:
                ckl = (_index(ck, li).reshape(b, max_len, nh, hd
                                              ).astype(cfg.dtype)
                       * _index(ks, li)[..., :nh, None].astype(cfg.dtype))
                cvl = (_index(cv, li).reshape(b, max_len, nh, hd
                                              ).astype(cfg.dtype)
                       * _index(vs, li)[..., :nh, None].astype(cfg.dtype))
        else:
            ck, cv = cache
            ck = store(ck, k.reshape(b, s, nh * hd), li)
            cv = store(cv, v.reshape(b, s, nh * hd), li)
            cache = (ck, cv)
            if use_ragged:
                attn = ragged_decode_attention(
                    q if mixed else q[:, 0], ck, cv, starts, ends,
                    block_tables=block_tables, layer=li, kv_heads=nh,
                    block=page if paged else 0, interpret=interpret)
                attn = attn.reshape(b * s, cfg.num_heads * hd)
            else:
                ckl = _index(ck, li).reshape(b, max_len, nh, hd)
                cvl = _index(cv, li).reshape(b, max_len, nh, hd)

        if not use_ragged:
            # mixed: per-row causal — query i of row b sees absolute
            # positions <= cache_index[b] + i (everything this request has
            # written; stale rows beyond are masked by causality)
            attn = dot_product_attention(
                q, ckl, cvl, kv_valid=kv_valid, causal=mixed,
                q_offset=cache_index if mixed else None, impl="xla")
            attn = attn.reshape(b * s, cfg.num_heads * hd)
        x2 = x2 + proj("o_proj", attn, li).astype(x2.dtype)

        ln2 = _index(layer_params["post_attention_layernorm"]["scale"], li)
        h = rms_norm(x2.astype(cfg.dtype), ln2.astype(cfg.dtype), cfg.rms_eps)
        gate = proj("gate_proj", h, li)
        up = proj("up_proj", h, li)
        down = proj("down_proj", jax.nn.silu(gate) * up, li)
        return x2 + down.astype(x2.dtype), cache

    x2, cache = jax.lax.fori_loop(0, cfg.num_layers, body,
                                  (x.reshape(b * s, hidden).astype(cfg.dtype),
                                   cache))
    return x2.reshape(b, s, hidden), cache


def decode_layers_packed(cfg, layer_params: Any, x: jnp.ndarray,
                         cos: jnp.ndarray, sin: jnp.ndarray,
                         kv_valid, cache: Tuple[jnp.ndarray, ...],
                         cache_index, *, tok_row, tok_slot, write_widths,
                         window: int, block_tables=None,
                         interpret: bool = False
                         ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
    """PACKED fused prefill+decode step: projections/MLP over real tokens
    only.

    The windowed mixed step above runs every projection over ``b*s``
    tokens even though decode-only rows carry one real token — at the
    serving geometry (8 slots, w=8) that is 64 tokens/step, past the int4
    weight-stream/compute crossover (~22 tokens on a v5e), and fused
    serving measured 121.8 tok/s vs 290.8 legacy on-chip (NOTES_r4).  The
    packed step carries ``P = b + window`` tokens: packed index i < b is
    row i's decode token (valid iff the row is decoding this step), and
    indices [b, b+window) hold prompt-chunk tokens packed greedily across
    the prefilling rows.  Projections, MLP, and norms run on the packed
    [P, hidden] batch — ~3x fewer tokens at the serving geometry — while
    attention scatters q into the [b, window] layout of the multi-query
    ragged kernel (whose extra window slots ride the per-row KV stream
    for near-zero cost; ops/decode_attention.py) and gathers the valid
    rows back.

    Args (beyond decode_layers_stacked):
      x: [P, hidden] packed token embeddings, P == b + window.
      cos/sin: [P, head_dim] rope tables at each token's absolute position.
      tok_row: [P] int32 — owning batch row; ``b`` marks an invalid token
        (its KV write OOB-drops and nothing gathers its output).
      tok_slot: [P] int32 — offset within the row's step window; token
        position = cache_index[tok_row] + tok_slot.  Must be < window and
        < write_widths[tok_row] for valid tokens (the engine's packing
        guarantees both).
      write_widths: [b] int32 — tokens each row consumes this step
        (decode rows 1, prefilling rows their chunk share, frozen 0).
      window: static int — max per-row width (the attention window).
    Returns:
      (hidden [P, hidden], new cache).
    """
    p_tok, hidden = x.shape
    b = cache_index.shape[0]
    nh, hd = cfg.num_kv_heads, cfg.head_dim
    int8_kv = len(cache) == 4
    paged = block_tables is not None
    assert getattr(cache_index, "ndim", 0) == 1, \
        "packed step requires per-row cache offsets"

    row_c = jnp.minimum(tok_row, b - 1)                    # clamped gathers
    pos_t = cache_index[row_c] + tok_slot                  # [P] absolute

    # ragged attention dispatch mirrors the Mosaic-alignment gate of
    # decode_layers_stacked above
    if paged:
        assert kv_valid is not None and cfg.decode_attention != "never", \
            "paged KV requires the ragged attention kernel"
        kv_len = kv_valid.shape[1]
        n_tiles = block_tables.shape[1]
        assert kv_len % n_tiles == 0
        page = kv_len // n_tiles
        use_ragged = True
    else:
        max_len = cache[0].shape[2]
        f_flat = nh * hd
        blk = _pick_block(max_len,
                          row_bytes=f_flat * cache[0].dtype.itemsize)
        granule = {1: 32, 2: 16, 4: 8}[cache[0].dtype.itemsize]
        use_ragged = (
            kv_valid is not None and cfg.decode_attention != "never"
            and blk >= 8
            and (cfg.decode_attention == "force"
                 or (jax.default_backend() == "tpu"
                     and f_flat % 128 == 0 and blk % granule == 0)))
    if use_ragged:
        # multi-query stair (ops/decode_attention.py): query slot i of row
        # r attends [start_r, end_r + i); kv_valid covers [start,
        # pos + width), so the stair base subtracts (width - 1)
        m32 = kv_valid.astype(jnp.int32)
        starts = jnp.argmax(m32, axis=-1).astype(jnp.int32)
        ends = (starts + jnp.sum(m32, axis=-1)
                - jnp.maximum(write_widths - 1, 0))

    # per-token cache write index; invalid tokens scatter out of bounds
    if paged:
        col = pos_t // page
        in_range = (tok_row < b) & (col < n_tiles)
        tiles = block_tables[row_c, jnp.minimum(col, n_tiles - 1)]
        widx = jnp.where(in_range, tiles * page + pos_t % page,
                         cache[0].shape[1])                # pool row / OOB
    else:
        widx = jnp.where(tok_row < b, pos_t, cache[0].shape[2])

    def proj(name: str, h2: jnp.ndarray, li: jnp.ndarray) -> jnp.ndarray:
        p = layer_params[name]
        packed, scale = p["kernel_q4"], p["kernel_scale"]
        group = h2.shape[-1] // scale.shape[1]
        y = int4_matmul_stacked(h2.astype(cfg.dtype), packed, scale, li,
                                group=group, interpret=interpret)
        if "lora_a" in p:
            a = _index(p["lora_a"], li).astype(cfg.dtype)
            bm = _index(p["lora_b"], li).astype(cfg.dtype)
            lscale = cfg.lora_alpha / cfg.lora_rank
            y = y + lscale * ((h2.astype(cfg.dtype) @ a) @ bm)
        return y

    def store(buf: jnp.ndarray, val: jnp.ndarray, li: jnp.ndarray
              ) -> jnp.ndarray:
        """Scatter val [P, f] at each token's (row, position)."""
        if paged:
            return buf.at[li, widx].set(val.astype(buf.dtype), mode="drop")
        return buf.at[li, tok_row, widx].set(val.astype(buf.dtype),
                                             mode="drop")

    def to_window(t: jnp.ndarray) -> jnp.ndarray:
        """Scatter packed [P, heads, hd] -> [b, window, heads, hd] (invalid
        tokens drop; untouched slots stay zero — the kernel computes
        garbage there and nothing gathers it)."""
        out = jnp.zeros((b, window) + t.shape[1:], t.dtype)
        return out.at[tok_row, tok_slot].set(t, mode="drop")

    def from_window(t: jnp.ndarray) -> jnp.ndarray:
        """Gather [b, window, f] -> packed [P, f]."""
        return t[row_c, tok_slot]

    def body(li, carry):
        x2, cache = carry                                  # x2 [P, hidden]
        ln1 = _index(layer_params["input_layernorm"]["scale"], li)
        h = rms_norm(x2.astype(cfg.dtype), ln1.astype(cfg.dtype),
                     cfg.rms_eps)

        q = proj("q_proj", h, li).reshape(p_tok, cfg.num_heads, hd)
        k = proj("k_proj", h, li).reshape(p_tok, nh, hd)
        v = proj("v_proj", h, li).reshape(p_tok, nh, hd)
        q = apply_rope(q[None], cos[None], sin[None])[0]
        k = apply_rope(k[None], cos[None], sin[None])[0]

        if int8_kv:
            from seedx_tpu.models.llama import quantize_kv

            ck, cv, ks, vs = cache
            sw = ks.shape[-1]              # lane-padded (kv_scale_width)
            kq, ksc = quantize_kv(k)
            vq, vsc = quantize_kv(v)
            ck = store(ck, kq.reshape(p_tok, nh * hd), li)
            cv = store(cv, vq.reshape(p_tok, nh * hd), li)
            ks = store(ks, jnp.pad(ksc.reshape(p_tok, nh).astype(ks.dtype),
                                   ((0, 0), (0, sw - nh))), li)
            vs = store(vs, jnp.pad(vsc.reshape(p_tok, nh).astype(vs.dtype),
                                   ((0, 0), (0, sw - nh))), li)
            cache = (ck, cv, ks, vs)
        else:
            ck, cv = cache
            ck = store(ck, k.reshape(p_tok, nh * hd), li)
            cv = store(cv, v.reshape(p_tok, nh * hd), li)
            cache = (ck, cv)

        q_win = to_window(q)
        if use_ragged:
            if int8_kv:
                attn = ragged_decode_attention(
                    q_win, cache[0], cache[1], starts, ends,
                    k_scale=cache[2], v_scale=cache[3],
                    block_tables=block_tables, layer=li, kv_heads=nh,
                    block=page if paged else 0, interpret=interpret)
            else:
                attn = ragged_decode_attention(
                    q_win, cache[0], cache[1], starts, ends,
                    block_tables=block_tables, layer=li, kv_heads=nh,
                    block=page if paged else 0, interpret=interpret)
        else:
            # XLA window path (CPU parity / alignment fallbacks): per-row
            # causal — query slot i of row r sees positions <= pos_r + i
            if int8_kv:
                ckl = (_index(cache[0], li).reshape(b, max_len, nh, hd
                                                    ).astype(cfg.dtype)
                       * _index(cache[2], li)[..., :nh, None
                                              ].astype(cfg.dtype))
                cvl = (_index(cache[1], li).reshape(b, max_len, nh, hd
                                                    ).astype(cfg.dtype)
                       * _index(cache[3], li)[..., :nh, None
                                              ].astype(cfg.dtype))
            else:
                ckl = _index(cache[0], li).reshape(b, max_len, nh, hd)
                cvl = _index(cache[1], li).reshape(b, max_len, nh, hd)
            attn = dot_product_attention(
                q_win, ckl, cvl, kv_valid=kv_valid, causal=True,
                q_offset=cache_index, impl="xla")
        attn = from_window(attn.reshape(b, window, cfg.num_heads * hd))
        x2 = x2 + proj("o_proj", attn, li).astype(x2.dtype)

        ln2 = _index(layer_params["post_attention_layernorm"]["scale"], li)
        h = rms_norm(x2.astype(cfg.dtype), ln2.astype(cfg.dtype),
                     cfg.rms_eps)
        gate = proj("gate_proj", h, li)
        up = proj("up_proj", h, li)
        down = proj("down_proj", jax.nn.silu(gate) * up, li)
        return x2 + down.astype(x2.dtype), cache

    x2, cache = jax.lax.fori_loop(0, cfg.num_layers, body,
                                  (x.astype(cfg.dtype), cache))
    return x2, cache
