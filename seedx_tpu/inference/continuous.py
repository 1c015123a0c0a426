"""Continuous (slot-based) batching: rolling admission into a live decode.

The reference serves one prompt at a time through HF ``generate``
(reference: src/inference/eval_img2text_seed_x_i.py — a bare for-loop);
``ServingEngine.flush`` batches, but every request in a batch starts and
finishes together, so one long answer holds the whole batch.  This engine
is the TPU-native analogue of vLLM-style continuous batching, built on
static shapes:

  * a fixed pool of B *slots*, each owning rows of one preallocated KV
    cache sized ``max(prompt_buckets) + max_new_tokens``;
  * prompts prefill into a fresh mini-cache (right-padded to a prompt
    bucket, one compiled program per bucket) and are spliced into a free
    slot row with ``dynamic_update_slice`` — admission never recompiles the
    decode;
  * decode advances ALL live slots together in jitted chunks of K steps;
    every row carries its own position / cache depth (the per-row
    ``cache_index`` scatter in models/llama.py) and its own contiguous
    kv-window mask, so rows at depth 40 and depth 900 share one program;
  * finished rows freeze (their logits/KV writes are masked garbage past
    the valid window) and are harvested + refilled between chunks.

Constrained image-token decoding (``constrain_image_tokens``) applies
per-row, so image spans interleave freely with text across slots.  Greedy
decoding by default (the reference's inference default, seed_x.py:180);
``do_sample`` enables temperature/top-p sampling — forced image spans stay
exact because the constrained decoder's forcing is absolute.

FUSED (chunked) PREFILL — ``fused_prefill=True`` (default for dense
engines): instead of a synchronous prompt-bucket prefill that stalls every
live slot on each admission (r3 profiling: serving is prefill/admission
dominated), admission just writes the request's prompt EMBEDDINGS into a
per-slot buffer (cheap; image splicing happens here once), and the decode
chunk becomes a MIXED step over a ``[slots, w]`` token window: decoding
rows occupy 1 window slot (their sampled token), prefilling rows consume
up to ``w`` prompt tokens per step, written at per-row cache offsets with
out-of-bounds-drop scatters.  Decode is weight-stream bound, so the extra
window rows ride the same int4 stream — prompt prefill comes nearly free
(Sarathi-style piggybacking), admission latency collapses to a buffer
write, and freed slots restart instantly.  Token-exact vs the legacy
bucket-prefill path (greedy); per-request budgets, image prompts, and
constrained image spans all behave identically.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from seedx_tpu.models.agent import ContinuousLVLM
from seedx_tpu.models.generation import (GenerationConfig, _sample,
                                         _trim_and_spans, build_result,
                                         constrain_image_tokens)
from seedx_tpu.models.llama import init_kv_cache, init_paged_kv_pool
from seedx_tpu.text.vocab import MultimodalVocab


@functools.partial(jax.jit, static_argnames=("model", "bucket"))
def _prefill(model, variables, embeds, p_lens, bucket):
    """Right-padded prompts [b, bucket, D] -> (mini_cache [L, b, bucket, ...],
    last_logits [b, V] fp32, last_hidden [b, D]).  ONE forward prefills every
    admitted request of a bucket together; one compile per (b, bucket)."""
    cfg = model.cfg.llm
    b = embeds.shape[0]
    cache = init_kv_cache(cfg, b, bucket)
    positions = jnp.broadcast_to(jnp.arange(bucket), (b, bucket))
    kv_valid = jnp.arange(bucket)[None, :] < p_lens[:, None]
    logits, hidden, cache = model.apply(
        variables, embeds, positions, kv_valid, cache, 0, method="llm_step")
    last = (p_lens - 1)[:, None, None]
    last_logits = jnp.take_along_axis(logits, last, axis=1)[:, 0]
    last_hidden = jnp.take_along_axis(hidden, last, axis=1)[:, 0]
    return cache, last_logits.astype(jnp.float32), last_hidden


@functools.partial(jax.jit, donate_argnames=("state",))
def _admit(state, row, mini_cache, src_row, p_len, last_logits, last_hidden,
           last_token, budget):
    """Splice row ``src_row`` of a (possibly batched) prefill mini-cache into
    slot ``row``; O(bucket) cache copy.  The slice happens inside this jit so
    admission compiles once per (admission-batch, bucket), not once per
    slice index."""
    def splice(big, minis):
        # minis [L, bb, bucket, ...] -> big [L, B, S, ...] at (0, row, 0, ..)
        mini = jax.lax.dynamic_slice_in_dim(minis, src_row, 1, axis=1)
        idx = (0, row) + (0,) * (big.ndim - 2)
        return jax.lax.dynamic_update_slice(big, mini.astype(big.dtype), idx)

    state = dict(state)
    state["cache"] = jax.tree.map(splice, state["cache"], mini_cache)
    upd = lambda buf, v: buf.at[row].set(jnp.asarray(v, buf.dtype))
    state["pos"] = upd(state["pos"], p_len)
    state["length"] = upd(state["length"], p_len)
    state["n"] = upd(state["n"], jnp.int32(0))
    state["prev_logits"] = upd(state["prev_logits"], last_logits[src_row])
    state["prev_hidden"] = upd(state["prev_hidden"], last_hidden[src_row])
    state["prev_token"] = upd(state["prev_token"], last_token)
    state["running"] = upd(state["running"], True)
    state["budget"] = upd(state["budget"], budget)
    state["out_tokens"] = state["out_tokens"].at[row].set(0)
    return state


@functools.partial(
    jax.jit,
    static_argnames=("page",),
    donate_argnames=("state",))
def _admit_paged(state, row, mini_cache, src_row, p_len, last_logits,
                 last_hidden, last_token, budget, tile_ids, page: int):
    """Paged admission: copy the prefilled mini-cache into pool tiles and
    point slot ``row``'s block-table row at them.

    tile_ids: [s_max // page] int32 — physical pool tiles covering the
    slot's whole logical range; entries the request doesn't need hold 0
    (the reserved dump tile, never referenced by a live window).  Copies
    cover the prompt bucket; allocated tiles beyond it stay uninitialised
    (decode writes each row before the window exposes it)."""
    n_copy = mini_cache[0].shape[2] // page

    def splice(pool, minis):
        mini = jax.lax.dynamic_slice_in_dim(minis, src_row, 1, axis=1)[:, 0]
        for t in range(n_copy):           # [L, bucket, f] -> pool tiles
            blk = jax.lax.dynamic_slice_in_dim(mini, t * page, page, axis=1)
            pool = jax.lax.dynamic_update_slice(
                pool, blk.astype(pool.dtype), (0, tile_ids[t] * page, 0))
        return pool

    state = dict(state)
    state["cache"] = jax.tree.map(splice, state["cache"], mini_cache)
    state["tables"] = state["tables"].at[row].set(tile_ids)
    upd = lambda buf, v: buf.at[row].set(jnp.asarray(v, buf.dtype))
    state["pos"] = upd(state["pos"], p_len)
    state["length"] = upd(state["length"], p_len)
    state["n"] = upd(state["n"], jnp.int32(0))
    state["prev_logits"] = upd(state["prev_logits"], last_logits[src_row])
    state["prev_hidden"] = upd(state["prev_hidden"], last_hidden[src_row])
    state["prev_token"] = upd(state["prev_token"], last_token)
    state["running"] = upd(state["running"], True)
    state["budget"] = upd(state["budget"], budget)
    state["out_tokens"] = state["out_tokens"].at[row].set(0)
    return state


@functools.partial(jax.jit, donate_argnames=("state",))
def _admit_fused(state, row, embeds, p_len, last_token, budget,
                 tile_ids=None):
    """Fused-prefill admission: write the request's padded prompt
    embeddings [1, p_pad, D] into slot ``row``'s prompt buffer and arm the
    per-row prefill cursor.  No prompt forward happens here — the mixed
    decode chunk consumes the buffer w tokens per step.  ``tile_ids``
    (paged mode) points the slot's block table at its allocated pool
    tiles; prefill KV writes resolve through it."""
    state = dict(state)
    if tile_ids is not None:
        state["tables"] = state["tables"].at[row].set(tile_ids)
    state["prompt_embeds"] = jax.lax.dynamic_update_slice(
        state["prompt_embeds"], embeds.astype(state["prompt_embeds"].dtype),
        (row, 0, 0))
    upd = lambda buf, v: buf.at[row].set(jnp.asarray(v, buf.dtype))
    state["pos"] = upd(state["pos"], jnp.int32(0))
    state["p_pos"] = upd(state["p_pos"], jnp.int32(0))
    state["p_len"] = upd(state["p_len"], p_len)
    state["length"] = upd(state["length"], p_len)
    state["n"] = upd(state["n"], jnp.int32(0))
    # prev_token = the LAST PROMPT token: it survives prefill untouched, so
    # the first sampled step sees it for constrained image-span forcing
    # (matches the legacy admission's last_token contract)
    state["prev_token"] = upd(state["prev_token"], last_token)
    state["running"] = upd(state["running"], True)
    state["budget"] = upd(state["budget"], budget)
    state["out_tokens"] = state["out_tokens"].at[row].set(0)
    return state


@functools.partial(
    jax.jit,
    static_argnames=("model", "gen_cfg", "vocab", "k", "s_max", "w",
                     "packed"),
    donate_argnames=("state",))
def _mixed_chunk(model, variables, state, gen_cfg: GenerationConfig,
                 vocab: MultimodalVocab, k: int, s_max: int, w: int,
                 packed: bool = False):
    """Advance every slot by up to ``k`` MIXED steps: decoding rows emit one
    greedy/sampled token per step; prefilling rows consume prompt-buffer
    tokens (their KV rides the decode weight stream).  A row whose prefill
    completes at step i starts sampling at step i+1 — its final prompt
    position's logits land in prev_logits.

    Two step layouts (same token-exact semantics):

      * ``packed=True`` (stacked-int4 engines): each step carries
        ``P = slots + w`` REAL tokens — one per decoding row plus a
        ``w``-token prompt chunk packed greedily (row order) across the
        prefilling rows — through the flat packed forward
        (decode_stacked.decode_layers_packed).  Projections/MLP cost P
        tokens, not slots*w: the windowed layout measured 121.8 tok/s vs
        290.8 legacy on-chip because every decode-only row dragged w-1
        garbage window slots through the MLP (NOTES_r4).
      * ``packed=False`` (flax-path fallback): the [slots, w] window step
        — every row gets a w-slot window, decoding rows use slot 0.
    """
    b, t = state["out_tokens"].shape
    n_img = gen_cfg.num_img_gen_tokens
    rows = jnp.arange(b)
    hid_dtype = state["out_hidden"].dtype

    def step(st):
        state, i = st
        running = state["running"]
        prefilling = running & (state["p_pos"] < state["p_len"])
        decoding = running & ~prefilling

        constrained = constrain_image_tokens(
            state["prev_token"], state["prev_logits"], vocab, n_img)
        rng, sub = jax.random.split(state["rng"])
        token = _sample(constrained, sub, gen_cfg).astype(jnp.int32)
        token = jnp.where(decoding, token, gen_cfg.pad_token_id)
        state = dict(state, rng=rng)

        # collect (read-modify-write so non-decoding rows keep their cells)
        n_w = jnp.minimum(state["n"], t - 1)
        cur_tok = state["out_tokens"][rows, n_w]
        out_tokens = state["out_tokens"].at[rows, n_w].set(
            jnp.where(decoding, token, cur_tok))
        cur_hid = state["out_hidden"][rows, n_w]
        out_hidden = state["out_hidden"].at[rows, n_w].set(
            jnp.where(decoding[:, None],
                      state["prev_hidden"].astype(hid_dtype), cur_hid))

        ended = token == gen_cfg.eos_token_id
        n_new = jnp.where(decoding, state["n"] + 1, state["n"])
        still = jnp.where(decoding,
                          decoding & ~ended & (n_new < state["budget"]),
                          running)

        pos = state["pos"]
        if packed:
            # prompt-chunk allocation: w tokens shared greedily in row
            # order (exactly mirrored by the host's _prefill_remaining
            # bookkeeping — keep the two in sync)
            need = jnp.where(prefilling,
                             jnp.minimum(w, state["p_len"] - state["p_pos"]),
                             0).astype(jnp.int32)
            cum = jnp.cumsum(need)
            alloc = jnp.clip(w - (cum - need), 0, need)
            w_valid = jnp.where(decoding, 1, alloc).astype(jnp.int32)

            acum = jnp.cumsum(alloc)
            off = jnp.arange(w)
            # prefill token o belongs to the first row whose acum exceeds o
            r_j = jnp.searchsorted(acum, off, side="right").astype(jnp.int32)
            valid_p = off < acum[-1]
            r_c = jnp.minimum(r_j, b - 1)
            slot_p = (off - (acum[r_c] - alloc[r_c])).astype(jnp.int32)

            tok_embeds = model.apply(variables, token, method="embed_ids")
            pe = state["prompt_embeds"]
            emb_p = pe[r_c, state["p_pos"][r_c] + slot_p]       # [w, D]
            embeds = jnp.concatenate(
                [tok_embeds.astype(pe.dtype), emb_p], axis=0)   # [P, D]
            tok_row = jnp.concatenate(
                [jnp.where(decoding, rows, b),
                 jnp.where(valid_p, r_j, b)]).astype(jnp.int32)
            tok_slot = jnp.concatenate(
                [jnp.zeros((b,), jnp.int32), slot_p])
            positions = pos[jnp.minimum(tok_row, b - 1)] + tok_slot
            kv_valid = (jnp.arange(s_max)[None, :]
                        <= (pos + w_valid - 1)[:, None])
            logits, hidden, cache = model.apply(
                variables, embeds, positions, kv_valid, state["cache"],
                pos, method="llm_step", block_tables=state.get("tables"),
                write_widths=w_valid, tok_row=tok_row, tok_slot=tok_slot,
                packed_window=w)
            # per-row LAST token: a decoding row's sole token sits at
            # packed index row; a prefilling row's chunk ends at
            # b + acum - 1.  Rows given no tokens this step gather garbage
            # that `keep` masks below.
            last_idx = jnp.clip(jnp.where(decoding, rows, b + acum - 1),
                                0, b + w - 1)
            last_logits = logits[last_idx]
            last_hidden = hidden[last_idx]
            active = decoding | (prefilling & (alloc > 0))
        else:
            # window [b, w, D]: prompt slice for prefilling rows; the
            # sampled token at slot 0 (rest garbage) for decoding rows
            tok_embeds = model.apply(variables, token[:, None],
                                     method="embed_ids")
            prompt_win = jax.vmap(
                lambda pe, p: jax.lax.dynamic_slice(
                    pe, (p, 0), (w, pe.shape[-1])))(
                state["prompt_embeds"], state["p_pos"])
            tok_win = jnp.pad(tok_embeds.astype(prompt_win.dtype),
                              ((0, 0), (0, w - 1), (0, 0)))
            embeds = jnp.where(prefilling[:, None, None], prompt_win,
                               tok_win)

            w_valid = jnp.where(
                prefilling,
                jnp.minimum(w, state["p_len"] - state["p_pos"]),
                jnp.where(decoding, 1, 0)).astype(jnp.int32)
            positions = pos[:, None] + jnp.arange(w)[None, :]
            # kv window: row-level end mask (required at w==1, where the
            # seq-1 path has no causal bias); for w>1 the per-row causal
            # bias (q_offset=pos) additionally stops queries seeing later
            # window slots, so together each query sees exactly [0, pos+i]
            kv_valid = (jnp.arange(s_max)[None, :]
                        <= (pos + w_valid - 1)[:, None])
            logits, hidden, cache = model.apply(
                variables, embeds, positions, kv_valid, state["cache"],
                pos, method="llm_step", block_tables=state.get("tables"),
                write_widths=w_valid)
            last = jnp.maximum(w_valid - 1, 0)[:, None, None]
            last_logits = jnp.take_along_axis(logits, last, axis=1)[:, 0]
            last_hidden = jnp.take_along_axis(hidden, last, axis=1)[:, 0]
            active = prefilling | decoding

        keep = lambda new, old: jnp.where(active[:, None], new, old)
        state = dict(
            state, cache=cache, out_tokens=out_tokens, out_hidden=out_hidden,
            n=n_new, running=still,
            pos=pos + w_valid,                       # 0 for frozen rows
            p_pos=state["p_pos"] + jnp.where(prefilling, w_valid, 0),
            length=jnp.where(decoding, state["length"] + 1, state["length"]),
            prev_logits=keep(last_logits.astype(jnp.float32),
                             state["prev_logits"]),
            prev_hidden=keep(last_hidden, state["prev_hidden"]),
            prev_token=jnp.where(decoding, token, state["prev_token"]))
        return state, i + 1

    def cond(st):
        state, i = st
        return (i < k) & jnp.any(state["running"])

    state, _ = jax.lax.while_loop(cond, step, (state, jnp.int32(0)))
    return state


@functools.partial(
    jax.jit,
    static_argnames=("model", "gen_cfg", "vocab", "k", "s_max"),
    donate_argnames=("state",))
def _decode_chunk(model, variables, state, gen_cfg: GenerationConfig,
                  vocab: MultimodalVocab, k: int, s_max: int):
    """Advance every running slot by up to ``k`` greedy steps."""
    b, t = state["out_tokens"].shape
    n_img = gen_cfg.num_img_gen_tokens
    rows = jnp.arange(b)
    hid_dtype = state["out_hidden"].dtype

    def step(st):
        state, i = st
        running = state["running"]
        constrained = constrain_image_tokens(
            state["prev_token"], state["prev_logits"], vocab, n_img)
        rng, sub = jax.random.split(state["rng"])
        # _sample: greedy or temperature/top-p per gen_cfg; one key samples
        # independently per row.  Forced image-span ids are absolute
        # (non-forced ids drop to -1e9 in constrain_image_tokens), so
        # sampling cannot derail a span.
        token = _sample(constrained, sub, gen_cfg).astype(jnp.int32)
        token = jnp.where(running, token, gen_cfg.pad_token_id)
        state = dict(state, rng=rng)

        # collect (read-modify-write so frozen rows keep their cells)
        n_w = jnp.minimum(state["n"], t - 1)
        cur_tok = state["out_tokens"][rows, n_w]
        out_tokens = state["out_tokens"].at[rows, n_w].set(
            jnp.where(running, token, cur_tok))
        cur_hid = state["out_hidden"][rows, n_w]
        out_hidden = state["out_hidden"].at[rows, n_w].set(
            jnp.where(running[:, None],
                      state["prev_hidden"].astype(hid_dtype), cur_hid))

        ended = token == gen_cfg.eos_token_id
        n_new = jnp.where(running, state["n"] + 1, state["n"])
        still = running & ~ended & (n_new < state["budget"])

        # one forward for every slot (frozen rows compute masked garbage)
        embeds = model.apply(variables, token[:, None], method="embed_ids")
        pos = state["pos"]
        kv_valid = jnp.arange(s_max)[None, :] <= pos[:, None]
        logits, hidden, cache = model.apply(
            variables, embeds, pos[:, None], kv_valid, state["cache"], pos,
            method="llm_step", block_tables=state.get("tables"))

        keep = lambda new, old: jnp.where(
            running.reshape((-1,) + (1,) * (new.ndim - 1)), new, old)
        state = dict(
            state, cache=cache, out_tokens=out_tokens, out_hidden=out_hidden,
            n=n_new, running=still,
            pos=jnp.where(running, pos + 1, pos),
            length=jnp.where(running, state["length"] + 1, state["length"]),
            prev_logits=keep(logits[:, 0].astype(jnp.float32),
                             state["prev_logits"]),
            prev_hidden=keep(hidden[:, 0], state["prev_hidden"]),
            prev_token=jnp.where(running, token, state["prev_token"]))
        return state, i + 1

    def cond(st):
        state, i = st
        return (i < k) & jnp.any(state["running"])

    state, _ = jax.lax.while_loop(cond, step, (state, jnp.int32(0)))
    return state


class ContinuousEngine:
    """Rolling-admission decode over a fixed slot pool.

    Usage::

        eng = ContinuousEngine(rt, slots=8, max_new_tokens=256)
        ids = [eng.submit(req) for req in requests]   # generate_batch schema
        results = eng.run()                           # {id: result dict}

    ``submit`` may also be called between ``eng.step()`` calls — requests
    admit into slots as they free, which is the point.
    """

    def __init__(self, rt, slots: int = 8, max_new_tokens: int = 256,
                 chunk_steps: int = 16,
                 prompt_buckets=(128, 256, 512, 1024),
                 do_sample: bool = False, temperature: float = 0.7,
                 top_p: float = 0.5, seed: int = 0,
                 paged: bool = False, page_size: int = 128,
                 pool_tokens: int = 0,
                 fused_prefill: Optional[bool] = None,
                 prefill_width: int = 8):
        """``paged=True`` replaces the dense per-slot KV reservation
        (slots x (max_bucket + max_new_tokens) rows) with a shared tile
        pool + per-slot block tables (vLLM-style): requests only hold
        ceil((p_len + budget) / page_size) tiles, so many short requests
        fit where dense slots reserve worst-case, and ``pool_tokens``
        (default: the dense footprint) sizes memory independently of the
        slot count.  Requires the int4 stacked decode path with ragged
        attention (models/decode_stacked.py paged mode).

        ``fused_prefill`` (default: OFF — the r5 single-chip A/B measured
        it at 0.4x the legacy engine's throughput; see __init__)
        interleaves prompt prefill into the decode chunks
        ``prefill_width`` tokens per row per step instead of stalling all
        slots on bucket prefills — see the module docstring.  Paged mode
        composes: prefill KV writes resolve through the slot's block
        table (the multi-query ragged kernel's paged stair)."""
        self.rt = rt
        self.model: ContinuousLVLM = rt.agent
        self.variables = {"params": rt.agent_params}
        self.vocab = rt.tokenizer.vocab
        self.gen_cfg = GenerationConfig(
            max_new_tokens=max_new_tokens,
            num_img_gen_tokens=rt.agent_cfg.num_img_out_tokens,
            eos_token_id=rt.tokenizer.eos_token_id,
            pad_token_id=rt.tokenizer.pad_token_id,
            prompt_buckets=tuple(prompt_buckets),
            do_sample=do_sample, temperature=temperature, top_p=top_p)
        self.slots = slots
        self.chunk_steps = chunk_steps
        self._pending: List[tuple] = []     # (req_id, request, budget)
        self._slot_req: List[Optional[int]] = [None] * slots
        self._results: Dict[int, Dict[str, Any]] = {}
        self._count = 0
        self._completed = 0
        self._generated_tokens = 0
        self._chunks = 0

        cfg = self.model.cfg.llm
        t = max_new_tokens
        s_max = max(self.gen_cfg.prompt_buckets) + t
        self._s_max = s_max
        self.paged = paged
        if fused_prefill is None:
            # Default OFF: the r5 chip A/B measured packed fused dense at
            # 114-119 tok/s (@32/@96 requests; width-16: 75) vs 293.6 for
            # the legacy stall-on-prefill engine, and paged fused at 86.9
            # vs 241.6 non-fused, in the same rolling-admission window.
            # Sarathi-style admission smoothing loses to the extra
            # [slots, 1+w] projection work on one chip at this geometry;
            # fused stays available via fused_prefill=True for multi-chip
            # latency-SLA serving where admission stalls dominate.
            fused_prefill = False
        self.fused = fused_prefill
        self.prefill_width = prefill_width
        # PACKED fused layout whenever the stacked-int4 decode loop will
        # dispatch (mirror of LlamaModel's use_stacked gate): projections
        # run over slots + prefill_width real tokens instead of the
        # [slots, w] window (decode_stacked.decode_layers_packed)
        self._packed = (
            cfg.scan_layers and cfg.quantization == "int4"
            and cfg.stacked_decode != "never"
            and (cfg.stacked_decode == "force"
                 or jax.default_backend() == "tpu"))
        # host mirror of each slot's remaining prompt tokens (exact: the
        # simulation in step() replays the device's allocation rule)
        self._prefill_remaining = [0] * slots
        if paged:
            if cfg.quantization != "int4" or cfg.decode_attention == "never":
                raise ValueError("paged KV requires quantization='int4' "
                                 "(stacked decode) with decode_attention on")
            if s_max % page_size or any(b % page_size
                                        for b in self.gen_cfg.prompt_buckets):
                raise ValueError("page_size must divide every prompt bucket "
                                 "and max bucket + max_new_tokens")
            # Fail here, not at first decode: the ragged kernel's Mosaic
            # dispatch rules (ops/decode_attention.py) need pages on the KV
            # dtype's sublane granule and 128-lane flat KV rows.  Only the
            # real TPU dispatch enforces them (CPU tests run interpret
            # mode at tiny geometry), so gate on the backend.
            if jax.default_backend() == "tpu":
                kv_itemsize = (1 if cfg.kv_quantization == "int8"
                               else jnp.dtype(cfg.dtype).itemsize)
                granule = {1: 32, 2: 16, 4: 8}[kv_itemsize]
                if page_size % granule:
                    raise ValueError(
                        f"page_size {page_size} must be a multiple of the "
                        f"KV dtype's sublane granule ({granule} for "
                        f"itemsize {kv_itemsize})")
                if (cfg.num_kv_heads * cfg.head_dim) % 128:
                    raise ValueError(
                        "paged KV needs kv_heads*head_dim % 128 == 0 (flat "
                        f"KV rows are Mosaic lanes); got "
                        f"{cfg.num_kv_heads * cfg.head_dim}")
            self.page = page_size
            n_tiles = max(pool_tokens or slots * s_max, 2 * page_size
                          ) // page_size
            self._pool_tiles = n_tiles
            # tile 0 is the reserved dump target for unused copy slots
            self._free_tiles = list(range(1, n_tiles))
            self._slot_tiles: List[Optional[list]] = [None] * slots
            cache = init_paged_kv_pool(cfg, n_tiles * page_size)
        else:
            cache = init_kv_cache(cfg, slots, s_max)
        self.state = {
            "cache": cache,
            "pos": jnp.zeros((slots,), jnp.int32),
            "length": jnp.zeros((slots,), jnp.int32),
            "n": jnp.zeros((slots,), jnp.int32),
            "prev_logits": jnp.zeros((slots, cfg.padded_vocab_size),
                                     jnp.float32),
            "prev_hidden": jnp.zeros((slots, cfg.hidden_size), cfg.dtype),
            "prev_token": jnp.full((slots,), self.gen_cfg.pad_token_id,
                                   jnp.int32),
            "running": jnp.zeros((slots,), bool),
            "budget": jnp.full((slots,), t, jnp.int32),
            "rng": jax.random.PRNGKey(seed),
            "out_tokens": jnp.zeros((slots, t), jnp.int32),
            "out_hidden": jnp.zeros((slots, t, cfg.hidden_size), cfg.dtype),
        }
        if paged:
            self.state["tables"] = jnp.zeros((slots, s_max // page_size),
                                             jnp.int32)
        if self.fused:
            # +prefill_width pad rows: the window dynamic_slice must never
            # clamp (a clamped start would shift real tokens)
            self._p_pad = max(self.gen_cfg.prompt_buckets) + prefill_width
            self.state["prompt_embeds"] = jnp.zeros(
                (slots, self._p_pad, cfg.hidden_size), cfg.dtype)
            self.state["p_pos"] = jnp.zeros((slots,), jnp.int32)
            self.state["p_len"] = jnp.zeros((slots,), jnp.int32)

    def warmup(self, buckets=None):
        """Precompile the admission grid: one batched prefill AND one admit
        per (power-of-two admission batch ≤ slots) x (prompt bucket).
        Without this, a live server pays a full XLA compile the first time
        some number of slots frees together.  Text-only shapes; image-
        carrying prompts add their own embed_with_images variants on first
        use.  Call before submitting (warm admits scribble on a FREE slot's
        inert rows and clear the running flag after).

        Fused mode needs only THREE programs regardless of bucket/batch
        shape: the prompt embed at the single padded length, the admit, and
        the mixed chunk (+ the pure-decode chunk compiled by run())."""
        if self.fused:
            free = next((i for i, r in enumerate(self._slot_req)
                         if r is None), None)
            if free is None:
                return self
            dummy = {"input_ids": [1, 2]}
            embeds = self._embed_prompt(dummy)
            tile_arg = None
            if self.paged:
                # all-zero table: every write resolves to the reserved dump
                # tile's rows (never referenced by a live window)
                tile_arg = jnp.zeros((self._s_max // self.page,), jnp.int32)
            self.state = _admit_fused(
                self.state, jnp.int32(free), embeds, jnp.int32(2),
                jnp.int32(2), jnp.int32(0), tile_ids=tile_arg)
            self.state = _mixed_chunk(
                self.model, self.variables, self.state, self.gen_cfg,
                self.vocab, self.chunk_steps, self._s_max,
                self.prefill_width, packed=self._packed)
            self.state = _decode_chunk(
                self.model, self.variables, self.state, self.gen_cfg,
                self.vocab, self.chunk_steps, self._s_max)
            self.state = dict(
                self.state,
                running=self.state["running"].at[free].set(False),
                p_len=self.state["p_len"].at[free].set(0))
            return self
        buckets = tuple(buckets) if buckets is not None \
            else self.gen_cfg.prompt_buckets
        dummy = {"input_ids": [1, 2]}
        free = next((i for i, r in enumerate(self._slot_req) if r is None),
                    None)
        limit = 1
        while limit < self.slots:      # admission batches pad to pow2, so a
            limit *= 2                 # non-pow2 slot count reaches the NEXT
        bb = 1                         # power (e.g. slots=6 -> bb=8)
        while bb <= limit:
            for bucket in buckets:
                minis, lgs, lhs = self._prefill_group([dummy] * bb, bucket)
                if free is not None:
                    if self.paged:
                        # all-zero table: every copy lands on the reserved
                        # dump tile, never referenced by a live window
                        ids = jnp.zeros((self._s_max // self.page,),
                                        jnp.int32)
                        self.state = _admit_paged(
                            self.state, jnp.int32(free), minis, jnp.int32(0),
                            jnp.int32(2), lgs, lhs, jnp.int32(2),
                            jnp.int32(0), ids, page=self.page)
                    else:
                        self.state = _admit(
                            self.state, jnp.int32(free), minis, jnp.int32(0),
                            jnp.int32(2), lgs, lhs, jnp.int32(2),
                            jnp.int32(0))
                    self.state = dict(
                        self.state,
                        running=self.state["running"].at[free].set(False))
            bb *= 2
        return self

    # ---- submission ------------------------------------------------------

    def submit(self, request: Dict[str, Any],
               max_new_tokens: Optional[int] = None) -> int:
        """Queue a request (generate_batch schema); returns its id.
        ``max_new_tokens`` caps THIS request (≤ the engine-wide budget) —
        rows with small budgets free their slots early, which is where
        continuous batching beats the all-rows-run-together flush."""
        max_bucket = max(self.gen_cfg.prompt_buckets)
        if len(request["input_ids"]) > max_bucket:
            # the slot cache is sized max(prompt_buckets) + max_new_tokens;
            # a longer prompt would write KV past the cache end (silently
            # dropped by the per-row scatter) — fail loudly instead
            raise ValueError(
                f"prompt length {len(request['input_ids'])} exceeds the "
                f"largest prompt bucket {max_bucket}")
        rid = self._count
        self._count += 1
        budget = min(max_new_tokens or self.gen_cfg.max_new_tokens,
                     self.gen_cfg.max_new_tokens)
        if self.paged:
            n_t = self._tiles_needed(request, budget)
            if n_t > self._pool_tiles - 1:
                raise ValueError(
                    f"request needs {n_t} KV tiles but the pool has "
                    f"{self._pool_tiles - 1}; raise pool_tokens")
        self._pending.append((rid, request, budget))
        return rid

    # ---- internals -------------------------------------------------------

    def _embed_prompt(self, request):
        """Fused admission embed: ONE request's prompt (ids + spliced image
        embeddings) padded to the fixed buffer length -> [1, p_pad, D].
        Exactly one compile for text prompts (padding is a gather no-op);
        image-carrying prompts add one variant per image count."""
        p_pad = self._p_pad
        pad_id = self.gen_cfg.pad_token_id
        ids = np.full((1, p_pad), pad_id, np.int32)
        p = len(request["input_ids"])
        ids[0, :p] = np.asarray(request["input_ids"], np.int32)
        cm = request.get("ids_cmp_mask")
        cmp_padded = None
        if cm is not None:
            cmp_padded = np.zeros((1, p_pad), bool)
            cmp_padded[0, :p] = np.asarray(cm, bool)
        image_embeds = request.get("image_embeds")
        ecm = ppos = None
        if image_embeds is not None:
            ecm = jnp.asarray(np.asarray(request["embeds_cmp_mask"], bool))
            pp = request.get("patch_positions")
            ppos = jnp.asarray(pp) if pp is not None else None
        return self.model.apply(
            self.variables, jnp.asarray(ids),
            image_embeds,
            jnp.asarray(cmp_padded) if cmp_padded is not None else None,
            ecm, ppos, method="embed_with_images")

    def _prefill_group(self, requests, bucket):
        """ONE batched prefill for every request of a prompt bucket; prompts
        are RIGHT-padded (no left pad needed — every slot row starts its
        cache at 0) and the batch dim pads to a power of two so the compiled
        (batch, bucket) grid stays small."""
        b = len(requests)
        bb = 1
        while bb < b:
            bb *= 2
        pad_id = self.gen_cfg.pad_token_id
        ids_padded = np.full((bb, bucket), pad_id, np.int32)
        cmp_padded = np.zeros((bb, bucket), bool)
        p_lens = np.ones((bb,), np.int32)
        any_cmp = False
        img_parts, ecm_parts, pp_parts = [], [], []
        for i, r in enumerate(requests):
            ids = r["input_ids"]
            p = len(ids)
            ids_padded[i, :p] = np.asarray(ids, np.int32)
            p_lens[i] = p
            cm = r.get("ids_cmp_mask")
            if cm is not None:
                cmp_padded[i, :p] = np.asarray(cm, bool)
                any_cmp = True
            if r.get("image_embeds") is not None:
                img_parts.append(r["image_embeds"])
                ecm_parts.append(np.asarray(r["embeds_cmp_mask"], bool))
                pp_parts.append(r.get("patch_positions"))
        image_embeds = jnp.concatenate(img_parts) if img_parts else None
        ecm = np.concatenate(ecm_parts) if ecm_parts else None
        ppos = None
        if img_parts and any(p is not None for p in pp_parts):
            # requests without patch positions get the center default (the
            # reference's thumbnail coordinate) rather than silently
            # stripping positions from every co-admitted request
            ppos = jnp.concatenate([
                jnp.asarray(p) if p is not None
                else jnp.full((img.shape[0], 2), 0.5, jnp.float32)
                for p, img in zip(pp_parts, img_parts)])
        embeds = self.model.apply(
            self.variables, jnp.asarray(ids_padded),
            image_embeds,
            jnp.asarray(cmp_padded) if any_cmp else None,
            jnp.asarray(ecm) if ecm is not None else None,
            ppos, method="embed_with_images")
        return _prefill(self.model, self.variables, embeds,
                        jnp.asarray(p_lens), bucket)

    def _tiles_needed(self, request, budget) -> int:
        return -(-(len(request["input_ids"]) + budget) // self.page)

    def _admit_pending(self):
        free = [i for i, r in enumerate(self._slot_req) if r is None]
        if not free or not self._pending:
            return
        take, self._pending = (self._pending[:len(free)],
                               self._pending[len(free):])
        if self.fused:
            # admission = a prompt-buffer write; prefill happens inside the
            # mixed decode chunks (no bucket forward, no slot stall)
            if self.paged:
                admitted, deferred, avail = [], [], len(self._free_tiles)
                for item in take:
                    n_t = self._tiles_needed(item[1], item[2])
                    if n_t <= avail:
                        avail -= n_t
                        admitted.append(item)
                    else:
                        deferred.append(item)
                self._pending = deferred + self._pending
                take = admitted
            for rid, request, budget in take:
                row = free.pop(0)
                embeds = self._embed_prompt(request)
                p_len = len(request["input_ids"])
                tile_arg = None
                if self.paged:
                    n_t = self._tiles_needed(request, budget)
                    tiles = [self._free_tiles.pop() for _ in range(n_t)]
                    self._slot_tiles[row] = tiles
                    ids = np.zeros((self._s_max // self.page,), np.int32)
                    ids[:n_t] = tiles
                    tile_arg = jnp.asarray(ids)
                self.state = _admit_fused(
                    self.state, jnp.int32(row), embeds, jnp.int32(p_len),
                    jnp.int32(request["input_ids"][-1]), jnp.int32(budget),
                    tile_ids=tile_arg)
                self._slot_req[row] = rid
                self._prefill_remaining[row] = p_len
            return
        if self.paged:
            # best-effort FCFS: defer requests the tile pool can't hold yet
            # (their tiles free as running slots harvest)
            admitted, deferred, avail = [], [], len(self._free_tiles)
            for item in take:
                n_t = self._tiles_needed(item[1], item[2])
                if n_t <= avail:
                    avail -= n_t
                    admitted.append(item)
                else:
                    deferred.append(item)
            self._pending = deferred + self._pending
            take = admitted
        by_bucket: Dict[int, list] = {}
        for item in take:
            p_len = len(item[1]["input_ids"])
            bucket = next((x for x in self.gen_cfg.prompt_buckets
                           if x >= p_len), p_len)
            by_bucket.setdefault(bucket, []).append(item)
        for bucket, items in by_bucket.items():
            minis, lgs, lhs = self._prefill_group([r for _, r, _ in items],
                                                  bucket)
            for j, (rid, request, budget) in enumerate(items):
                row = free.pop(0)
                if self.paged:
                    n_t = self._tiles_needed(request, budget)
                    tiles = [self._free_tiles.pop() for _ in range(n_t)]
                    self._slot_tiles[row] = tiles
                    ids = np.zeros((self._s_max // self.page,), np.int32)
                    ids[:n_t] = tiles
                    self.state = _admit_paged(
                        self.state, jnp.int32(row), minis, jnp.int32(j),
                        jnp.int32(len(request["input_ids"])), lgs, lhs,
                        jnp.int32(request["input_ids"][-1]),
                        jnp.int32(budget), jnp.asarray(ids), page=self.page)
                else:
                    self.state = _admit(
                        self.state, jnp.int32(row), minis, jnp.int32(j),
                        jnp.int32(len(request["input_ids"])), lgs, lhs,
                        jnp.int32(request["input_ids"][-1]),
                        jnp.int32(budget))
                self._slot_req[row] = rid

    def _harvest(self):
        running = np.asarray(self.state["running"])
        n = np.asarray(self.state["n"])
        done_rows = [i for i, rid in enumerate(self._slot_req)
                     if rid is not None and not running[i]]
        if not done_rows:
            return
        out_tokens = np.asarray(self.state["out_tokens"])
        n_img = self.gen_cfg.num_img_gen_tokens
        span_list = []
        rows_meta = []
        for i in done_rows:
            tokens, eoi = _trim_and_spans(out_tokens[i, :n[i]], self.gen_cfg,
                                          self.vocab)
            rows_meta.append((i, tokens, eoi))
            span_list.extend((i, j) for j in eoi)
        img_gen_all = None
        if span_list:
            spans = jnp.stack([self.state["out_hidden"][i, j - n_img:j]
                               for i, j in span_list])
            img_gen_all = self.model.apply(self.variables, spans,
                                           method="decode_image_feats")
        consumed = 0
        for i, tokens, eoi in rows_meta:
            feat = None
            if eoi:
                feat = img_gen_all[consumed:consumed + len(eoi)]
                consumed += len(eoi)
            self._results[self._slot_req[i]] = build_result(
                tokens, eoi, feat, self.rt.tokenizer, self.vocab, n_img)
            self._slot_req[i] = None
            self._completed += 1
            self._generated_tokens += len(tokens)
            if self.paged and self._slot_tiles[i]:
                self._free_tiles.extend(self._slot_tiles[i])
                self._slot_tiles[i] = None
        if self.paged:
            # retarget harvested rows at the dump tile: a frozen slot keeps
            # issuing (masked-garbage) KV writes every chunk, and its freed
            # tiles may be reallocated to a live request before this slot
            # is re-admitted
            self.state = dict(
                self.state,
                tables=self.state["tables"].at[
                    jnp.asarray(done_rows, jnp.int32)].set(0))

    # ---- driving ---------------------------------------------------------

    def stats(self) -> Dict[str, Any]:
        """Engine counters for serving observability (host values only —
        reading them never blocks on the device)."""
        out = {"submitted": self._count,
               "pending": len(self._pending),
               "active_slots": sum(r is not None for r in self._slot_req),
               "slots": self.slots,
               "completed": self._completed,
               "generated_tokens": self._generated_tokens,
               "chunks": self._chunks}
        if self.paged:
            out["kv_tiles_free"] = len(self._free_tiles)
            out["kv_tiles_total"] = self._pool_tiles - 1
        return out

    def step(self) -> int:
        """Admit -> one decode chunk -> harvest.  Returns #results ready."""
        self._admit_pending()
        if any(r is not None for r in self._slot_req):
            if self.fused and any(r > 0 for r in self._prefill_remaining):
                # someone is mid-prompt: run the mixed (prefill+decode)
                # program
                self.state = _mixed_chunk(
                    self.model, self.variables, self.state, self.gen_cfg,
                    self.vocab, self.chunk_steps, self._s_max,
                    self.prefill_width, packed=self._packed)
                if self._packed:
                    # exact host replay of the device's greedy allocation:
                    # each step shares a prefill_width token budget across
                    # prefilling rows in row order (_mixed_chunk packed)
                    rem = list(self._prefill_remaining)
                    for _ in range(self.chunk_steps):
                        budget = self.prefill_width
                        for r in range(len(rem)):
                            take = min(rem[r], budget)
                            rem[r] -= take
                            budget -= take
                        if budget == self.prefill_width:
                            break
                    self._prefill_remaining = rem
                else:
                    # windowed layout: every prefilling row consumes
                    # min(w, remaining) per step
                    burn = self.chunk_steps * self.prefill_width
                    self._prefill_remaining = [
                        max(0, r - burn) for r in self._prefill_remaining]
            else:
                self.state = _decode_chunk(
                    self.model, self.variables, self.state, self.gen_cfg,
                    self.vocab, self.chunk_steps, self._s_max)
            self._chunks += 1
        self._harvest()
        return len(self._results)

    def run(self) -> Dict[int, Dict[str, Any]]:
        """Drain the queue; returns {request_id: result}."""
        while self._pending or any(r is not None for r in self._slot_req):
            before_pending = len(self._pending)
            before_chunks = self._chunks
            self.step()
            if (len(self._pending) == before_pending and before_pending
                    and self._chunks == before_chunks):
                # complete no-op step: nothing admitted AND nothing ran —
                # the pool can never satisfy the head request (submit()
                # bounds single requests, so this is sizing/fragmentation)
                raise RuntimeError(
                    "paged KV pool too small to admit pending requests")
        out, self._results = self._results, {}
        return out
