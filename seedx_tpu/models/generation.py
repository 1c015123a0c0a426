"""Jitted multimodal generation: prefill + ``lax.scan`` decode.

Replaces the reference's token-by-token HF python ``generate`` loop
(reference: src/models/mllm/seed_x.py:130-223) with a TPU-native engine:

  * prompts are left-padded into static length buckets; ONE jitted function
    runs the full prefill + ``max_new_tokens`` decode steps over a
    preallocated, donated KV cache,
  * the constrained image-token decoder
    (reference ``AutoImageTokenGenerationProcessor``,
    src/models/mllm/generation.py:9-31 — forces ``<img_00000>..<img_(n-1)>
    </img>`` once ``<img>`` is emitted, zeroes image-token scores otherwise)
    becomes pure integer arithmetic on the contiguous image-token id range,
  * every step's last hidden state is collected in the scan outputs, so the
    64-token spans preceding each ``</img>`` can be fed to the output
    resampler afterwards (reference: seed_x.py:196-210).

Greedy decoding matches the reference inference default (do_sample=False,
seed_x.py:180); temperature/top-p sampling is wired through an rng.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from seedx_tpu.models.agent import ContinuousLVLM
from seedx_tpu.models.llama import init_kv_cache
from seedx_tpu.text.vocab import DEFAULT_VOCAB, MultimodalVocab


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 512
    num_img_gen_tokens: int = 64
    do_sample: bool = False
    temperature: float = 0.7
    top_p: float = 0.5
    num_beams: int = 1
    length_penalty: float = 1.0   # HF-style: score / len**alpha
    eos_token_id: int = 2
    pad_token_id: int = 0
    prompt_buckets: tuple = (128, 256, 512, 1024)
    # n-gram speculative decoding (greedy, B=1): draft spec_k tokens per
    # round from the last spec_ngram-gram's previous occurrence in
    # prompt+generated text, verify all of them in ONE forward.  Exact:
    # emits precisely the greedy sequence; rounds just batch the
    # weight-stream over multiple tokens, breaking the one-token-per-pass
    # HBM roofline on self-similar text (quotes, code, JSON, grounding).
    # 0 disables.  (The reference's HF loop has no analogue.)
    spec_k: int = 0
    spec_ngram: int = 3
    # Adaptive gating (r3 honest accounting: a spec round costs ~1.8x a
    # plain step on chip — 45.6 rounds/s vs 82.1 steps/s at B=1 int4 — so
    # breakeven needs E[accepted] >= 0.8/round, which adversarial text does
    # NOT clear).  With spec_adaptive the engine runs a WINDOWED gate with
    # periodic RE-PROBING (policy selected by simulation over realistic
    # transcripts, scratch/spec_acceptance_study.py): speculate while the
    # acceptance rate over the last spec_window rounds clears
    # spec_min_accept; when a window (>= spec_probe_rounds rounds) falls
    # below the bar, fall back to plain decode for spec_reprobe steps,
    # then probe again — late-onset echo (doc-QA answers that start novel
    # and then quote the prompt) is recaptured, and the worst-case
    # overhead is bounded to spec_probe_rounds spec rounds per
    # spec_reprobe plain steps (~5% on never-repeating text).  Counters
    # (spec_rounds, spec_accepted) ride the result dict for session-level
    # policy.
    spec_adaptive: bool = True
    spec_probe_rounds: int = 4
    spec_min_accept: float = 0.8
    spec_reprobe: int = 48
    spec_window: int = 32


def constrain_image_tokens(prev_token: jnp.ndarray, logits: jnp.ndarray,
                           vocab: MultimodalVocab, num_img_gen_tokens: int
                           ) -> jnp.ndarray:
    """Jit-compatible equivalent of AutoImageTokenGenerationProcessor.

    prev_token: [B]; logits: [B, V] fp32.
    """
    img0 = vocab.img_token_start
    n = num_img_gen_tokens
    # Forced continuation: <img> -> img_0; img_k -> img_{k+1} (k < n-1);
    # img_{n-1} -> </img>.
    forced = jnp.where(
        prev_token == vocab.boi, img0,
        jnp.where((prev_token >= img0) & (prev_token < img0 + n - 1),
                  prev_token + 1,
                  jnp.where(prev_token == img0 + n - 1, vocab.eoi, -1)))
    is_forced = forced >= 0

    # Unforced: image continuation tokens and </img> get score 0.0
    # (reference: generation.py:29 — img_ids_list[1:] zeroed).
    v = logits.shape[-1]
    ids = jnp.arange(v)
    zero_ids = ((ids >= img0) & (ids < img0 + n)) | (ids == vocab.eoi)
    unforced_logits = jnp.where(zero_ids[None, :], 0.0, logits)

    # Forced: winner gets max + 10 AND every other id drops to -1e9.  The
    # reference only adds +10 (generation.py:26), which is equivalent under
    # its greedy decode — but under temperature sampling a +10 edge over a
    # 32k near-uniform vocab can lose the draw and derail the span, so the
    # forcing here is absolute.  Greedy behaviour is identical.
    win = jnp.max(logits, axis=-1, keepdims=True) + 10.0
    safe_forced = jnp.maximum(forced, 0)
    forced_logits = jnp.where(
        jax.nn.one_hot(safe_forced, v, dtype=bool), win,
        jnp.asarray(-1e9, logits.dtype))

    return jnp.where(is_forced[:, None], forced_logits, unforced_logits)


def _ngram_draft(hist, m, token0, k: int, ngram: int = 3):
    """Prompt-lookup drafting: continuation after the most recent earlier
    occurrence of the current tail n-gram.

    hist: [L] int32 token history (prompt + generated), -1 in unfilled/pad
    slots; hist[:m] is filled and ``token0`` is the (exact, already decided)
    next token at virtual position m.  Returns [k] draft ids, -1 where no
    match / beyond the filled region — -1 never verifies, so a bad draft
    costs nothing but the already-spent verify FLOPs.
    """
    if ngram < 2:
        raise ValueError(f"spec_ngram must be >= 2, got {ngram}")
    idx = jnp.arange(hist.shape[0])
    match = hist == token0
    # the tail (ngram-1)-gram preceding token0 must match at each candidate
    for o in range(1, ngram):
        match &= jnp.roll(hist, o) == hist[jnp.maximum(m - o, 0)]
    lo = ngram - 1
    match &= (idx >= lo) & (idx < m)
    j = jnp.max(jnp.where(match, idx, -1))
    start = jnp.clip(j + 1, 0, hist.shape[0] - k)
    drafts = jax.lax.dynamic_slice(hist, (start,), (k,))
    return jnp.where(j >= 0, drafts, -1)


def _spec_gate_update(sp, a, gen_cfg: GenerationConfig):
    """One speculative round's bookkeeping for the windowed re-probing
    acceptance gate (GenerationConfig.spec_adaptive; policy selected by
    transcript simulation, scratch/spec_acceptance_study.py).

    sp = (rounds, accepted, rounds_w, acc_w, cooldown, spec_on); ``a`` is
    this round's accepted-draft count.  A window of >= spec_probe_rounds
    rounds whose acceptance rate misses spec_min_accept gates speculation
    OFF and arms a spec_reprobe-step cooldown; windows that clear the bar
    roll every spec_window rounds so the decision tracks RECENT text."""
    rounds, accepted, rounds_w, acc_w, cooldown, spec_on = sp
    rounds, accepted = rounds + 1, accepted + a
    rounds_w, acc_w = rounds_w + 1, acc_w + a
    if not gen_cfg.spec_adaptive:
        return (rounds, accepted, rounds_w, acc_w, cooldown, spec_on)
    fail = ((rounds_w >= gen_cfg.spec_probe_rounds)
            & (acc_w.astype(jnp.float32)
               < gen_cfg.spec_min_accept * rounds_w.astype(jnp.float32)))
    reset = fail | (rounds_w >= gen_cfg.spec_window)
    z = jnp.int32(0)
    return (rounds, accepted, jnp.where(reset, z, rounds_w),
            jnp.where(reset, z, acc_w),
            jnp.where(fail, jnp.int32(gen_cfg.spec_reprobe), cooldown),
            spec_on & ~fail)


def _spec_cooldown_tick(sp):
    """One plain fallback step while gated off: count down to re-probe."""
    rounds, accepted, rounds_w, acc_w, cooldown, spec_on = sp
    cooldown = cooldown - 1
    return (rounds, accepted, rounds_w, acc_w, cooldown,
            spec_on | (cooldown <= 0))


def _sample(logits, rng, cfg: GenerationConfig):
    if not cfg.do_sample:
        return jnp.argmax(logits, axis=-1)
    logits = logits / cfg.temperature
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_idx = jnp.sum(cum < cfg.top_p, axis=-1, keepdims=True)
    cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
    filtered = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(rng, filtered, axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("model", "gen_cfg", "vocab"),
    donate_argnames=(),
)
def generate_tokens(
    model: ContinuousLVLM,
    variables: Any,
    prompt_embeds: jnp.ndarray,    # [B, P, D] (image embeds already spliced)
    prompt_mask: jnp.ndarray,      # [B, P] bool, LEFT-padded
    last_prompt_token: jnp.ndarray,  # [B] int32 (seeds the constrainer)
    rng: jnp.ndarray,
    gen_cfg: GenerationConfig,
    vocab: MultimodalVocab = DEFAULT_VOCAB,
    prompt_ids: Optional[jnp.ndarray] = None,   # [B, P], enables spec decode
    script_ids: Optional[jnp.ndarray] = None,   # [T] int32, see below
):
    """Returns dict with tokens [B, T], hidden [B, T, D], finished [B, T].

    ``script_ids`` (greedy B=1 only) pins the emitted stream to a given
    token script by biasing the logits at DECISION time (same max+10
    absolute forcing as the image-token constrainer): every forward —
    prefill, decode steps, spec verify — still runs the real model at full
    cost, but argmax at output position i becomes ``script_ids[i]``.  This
    exists for workload benchmarking: n-gram spec-decode acceptance is a
    pure function of the token stream, so replaying a realistic transcript
    through the REAL engine measures the adaptive gate's on-chip
    throughput without released weights (scratch/spec_acceptance_study.py
    is the model-free simulation this validates).

    Decode is a ``lax.while_loop`` (not a fixed-trip scan) with three
    upgrades over the reference's HF loop (seed_x.py:184-189):

      * early exit once every row is finished — a chat turn that ends at
        step 9 costs 9 steps, not ``max_new_tokens``,
      * forced-span chunking: when EVERY live row has just emitted ``<img>``
        (always at B=1; in batched text2img serving whenever the prompts are
        structurally aligned) the next
        ``num_img_gen_tokens`` ids + ``</img>`` are fully determined by the
        constrained decoder, so they run as ONE prefill-into-cache forward
        (65 tokens in parallel on the MXU) instead of 65 serial decode steps.
        The hidden states the output resampler needs are the chunk's own
        outputs, so alignment is unchanged (seed_x.py:196-207),
      * n-gram speculative decoding (``gen_cfg.spec_k > 0``, greedy B=1,
        needs ``prompt_ids``): each round drafts up to spec_k continuation
        tokens by prompt-lookup (``_ngram_draft``) and verifies them in ONE
        forward; the emitted tokens are exactly the greedy sequence (the
        accepted prefix is teacher-forced-exact, and the next round recomputes
        the first unverified token from the last accepted position's logits),
        so B=1 decode amortizes the weight stream over several tokens
        whenever the text revisits its own n-grams.
    """
    b, p, d = prompt_embeds.shape
    t = gen_cfg.max_new_tokens
    n_img = gen_cfg.num_img_gen_tokens
    # spec decode is greedy-exact only, and per-row accept counts diverge
    # under batching, so it is a B=1 feature (the latency-bound case).
    spec_k = (gen_cfg.spec_k
              if (gen_cfg.spec_k > 0 and b == 1 and not gen_cfg.do_sample
                  and prompt_ids is not None) else 0)
    # the verify forward writes spec_k + 1 cache rows even when fewer
    # tokens end up accepted near the t boundary — give the cache headroom
    t_cache = t + spec_k
    llm_cfg = model.cfg.llm
    cache = init_kv_cache(llm_cfg, b, p + t_cache)

    positions = jnp.maximum(
        jnp.cumsum(prompt_mask.astype(jnp.int32), axis=-1) - 1, 0)
    kv_valid_prefill = jnp.concatenate(
        [prompt_mask, jnp.zeros((b, t_cache), bool)], axis=-1)

    logits, prefill_hidden, cache = model.apply(
        variables, prompt_embeds, positions, kv_valid_prefill, cache, 0,
        method="llm_step")
    last_logits = logits[:, -1].astype(jnp.float32)
    last_hidden = prefill_hidden[:, -1]
    last_pos = positions[:, -1]

    hid_dtype = prefill_hidden.dtype
    out_tokens0 = jnp.full((b, t), gen_cfg.pad_token_id, jnp.int32)
    out_hidden0 = jnp.zeros((b, t, last_hidden.shape[-1]), hid_dtype)
    out_finished0 = jnp.zeros((b, t), bool)

    # The chunk fires when EVERY live row sits at <img> simultaneously —
    # always true at B=1 image turns, and true for batched text2img serving
    # where all prompts end with <img>.  Rows that desynchronise fall back to
    # the single-step forcing path.
    enable_chunk = t >= n_img + 1
    forced_ids = jnp.concatenate(
        [jnp.arange(vocab.img_token_start, vocab.img_token_start + n_img),
         jnp.asarray([vocab.eoi])]).astype(jnp.int32)      # [n_img + 1]

    if script_ids is not None:
        if b != 1:
            raise ValueError("script_ids forcing is a greedy B=1 feature")
        _script = script_ids.astype(jnp.int32)

        def _force_script(logits2d, pos_out):
            """Force argmax of logits2d [R, V] to the script token at each
            output-stream position pos_out [R] (positions >= t untouched —
            they are never emitted; spec write_idx drops them)."""
            tokw = _script[jnp.clip(pos_out, 0, t - 1)]
            v = logits2d.shape[-1]
            win = jnp.max(logits2d, axis=-1, keepdims=True) + 10.0
            forced = jnp.where(jax.nn.one_hot(tokw, v, dtype=bool), win,
                               jnp.asarray(-1e9, logits2d.dtype))
            return jnp.where((pos_out < t)[:, None], forced, logits2d)
    else:
        def _force_script(logits2d, pos_out):
            return logits2d

    if spec_k:
        # token history for n-gram lookup: prompt at [0, p), generated token
        # i at p + i; -1 marks pad/unwritten slots (never matches a draft)
        hist0 = jnp.concatenate([
            jnp.where(prompt_mask[0], prompt_ids[0].astype(jnp.int32), -1),
            jnp.full((t,), -1, jnp.int32)])
    else:
        hist0 = jnp.zeros((1,), jnp.int32)

    def decode_kv_valid(n_valid):
        return jnp.concatenate(
            [prompt_mask,
             jnp.broadcast_to(jnp.arange(t_cache)[None, :] < n_valid,
                              (b, t_cache))],
            axis=-1)

    def single_step(state):
        (cache, prev_logits, prev_hidden, prev_pos, prev_token, finished,
         rng, out_tokens, out_hidden, out_finished, hist, n) = state[:12]
        # plain step while the adaptive gate is off: tick the re-probe
        # cooldown (no-op sp passthrough when spec is disabled entirely)
        sp = _spec_cooldown_tick(state[12]) if spec_k else state[12]
        rng, sub = jax.random.split(rng)
        constrained = constrain_image_tokens(prev_token, prev_logits, vocab,
                                             n_img)
        constrained = _force_script(constrained, jnp.full((b,), n))
        token = _sample(constrained, sub, gen_cfg)
        token = jnp.where(finished, gen_cfg.pad_token_id, token)
        new_finished = finished | (token == gen_cfg.eos_token_id)
        # Emit the hidden state that PRODUCED this token, matching the
        # reference alignment (seed_x.py:196-207: hidden[i] -> token[i]).
        out_tokens = jax.lax.dynamic_update_slice(
            out_tokens, token[:, None], (0, n))
        out_hidden = jax.lax.dynamic_update_slice(
            out_hidden, prev_hidden[:, None].astype(hid_dtype), (0, n, 0))
        out_finished = jax.lax.dynamic_update_slice(
            out_finished, new_finished[:, None], (0, n))
        if spec_k:
            # gated-off fallback steps MUST extend the n-gram history too:
            # holes here corrupt every later draft's key lookup, so
            # re-probes after a cooldown always fail and the adaptive gate
            # can never recover (measured: grounding adaptive 64.7 tok/s
            # with holes vs the replayed policy's intended behavior of
            # staying on — scratch/spec_gate_sweep.py divergence hunt)
            hist = jax.lax.dynamic_update_slice(hist, token, (p + n,))

        pos = prev_pos + 1
        embeds = model.apply(variables, token[:, None], method="embed_ids")
        logits, hidden, cache = model.apply(
            variables, embeds, pos[:, None], decode_kv_valid(n + 1), cache,
            p + n, method="llm_step")
        return (cache, logits[:, 0].astype(jnp.float32), hidden[:, 0], pos,
                token, new_finished, rng, out_tokens, out_hidden,
                out_finished, hist, n + 1, sp)

    def chunk_step(state):
        (cache, prev_logits, prev_hidden, prev_pos, prev_token, finished,
         rng, out_tokens, out_hidden, out_finished, hist, n) = state[:12]
        sp = state[12]
        c = n_img + 1
        ids = jnp.broadcast_to(forced_ids[None, :], (b, c))
        embeds = model.apply(variables, ids, method="embed_ids")
        pos = prev_pos[:, None] + 1 + jnp.arange(c)[None, :]
        logits, hidden, cache = model.apply(
            variables, embeds, pos, decode_kv_valid(n + c), cache, p + n,
            method="llm_step")
        # hidden producing img_0 is prev_hidden (the <img> position); the
        # rest shift by one; the last row (at </img>) seeds the next token.
        hid_w = jnp.concatenate(
            [prev_hidden[:, None], hidden[:, :n_img]], axis=1)
        out_tokens = jax.lax.dynamic_update_slice(out_tokens, ids, (0, n))
        out_hidden = jax.lax.dynamic_update_slice(
            out_hidden, hid_w.astype(hid_dtype), (0, n, 0))
        out_finished = jax.lax.dynamic_update_slice(
            out_finished, jnp.broadcast_to(finished[:, None], (b, c)), (0, n))
        if spec_k:
            hist = jax.lax.dynamic_update_slice(hist, ids[0], (p + n,))
        return (cache, logits[:, -1].astype(jnp.float32), hidden[:, -1],
                prev_pos + c, jnp.full((b,), vocab.eoi, jnp.int32), finished,
                rng, out_tokens, out_hidden, out_finished, hist, n + c, sp)

    def spec_step(state):
        """One speculative round (greedy, B=1): decide the exact next token
        from the carried logits, draft spec_k continuations by n-gram
        lookup, verify all of them in one (spec_k+1)-position forward, and
        emit the verified-exact prefix.  The last accepted position's
        logits seed the next round, so no token is ever emitted from an
        unverified distribution."""
        (cache, prev_logits, prev_hidden, prev_pos, prev_token, finished,
         rng, out_tokens, out_hidden, out_finished, hist, n) = state[:12]
        sp = state[12]
        k = spec_k
        constrained = constrain_image_tokens(prev_token, prev_logits, vocab,
                                             n_img)
        constrained = _force_script(constrained, jnp.asarray(n)[None])
        token0 = jnp.argmax(constrained, axis=-1).astype(jnp.int32)   # [1]
        drafts = _ngram_draft(hist, p + n, token0[0], k, gen_cfg.spec_ngram)
        v = jnp.concatenate([token0, drafts])                # [k+1]
        embeds = model.apply(variables, jnp.maximum(v, 0)[None, :],
                             method="embed_ids")
        pos = prev_pos[:, None] + 1 + jnp.arange(k + 1)[None, :]
        logits_v, hidden_v, cache = model.apply(
            variables, embeds, pos, decode_kv_valid(n + k + 1), cache,
            p + n, method="llm_step")
        logits_v = logits_v.astype(jnp.float32)
        # the exact token AFTER each verify position, under the constrainer
        # (verify position i sits at output position n + i, so its NEXT
        # token is script position n + 1 + i under forcing)
        exp_next = jnp.argmax(
            _force_script(constrain_image_tokens(v, logits_v[0], vocab,
                                                 n_img),
                          n + 1 + jnp.arange(k + 1)),
            axis=-1).astype(jnp.int32)                       # [k+1]
        # accept drafts while they match and no stopper was emitted: eos
        # ends the sequence, <img> hands over to the forced-span chunk
        stop_prev = ((v[:k] == gen_cfg.eos_token_id) | (v[:k] == vocab.boi))
        acc = (drafts == exp_next[:k]) & ~stop_prev
        a = jnp.sum(jnp.cumprod(acc.astype(jnp.int32)))      # accepted
        e_count = a + 1                                      # emitted
        i_vec = jnp.arange(k + 1)
        # index t(_cache) is out of range -> mode="drop" skips non-emitted
        write_idx = jnp.where(i_vec < e_count, n + i_vec, t)
        fin_w = v == gen_cfg.eos_token_id
        hid_w = jnp.concatenate([prev_hidden[:, None], hidden_v[:, :k]],
                                axis=1)[0]
        out_tokens = out_tokens.at[0, write_idx].set(v, mode="drop")
        out_hidden = out_hidden.at[0, write_idx].set(
            hid_w.astype(hid_dtype), mode="drop")
        out_finished = out_finished.at[0, write_idx].set(fin_w, mode="drop")
        hist = hist.at[jnp.where(i_vec < e_count, p + n + i_vec, p + t)].set(
            v, mode="drop")

        last_tok = v[a]
        new_logits = jax.lax.dynamic_index_in_dim(
            logits_v[0], a, 0, keepdims=False)[None]
        new_hidden = jax.lax.dynamic_index_in_dim(
            hidden_v[0], a, 0, keepdims=False)[None]
        new_finished = finished | (last_tok == gen_cfg.eos_token_id)
        return (cache, new_logits, new_hidden, prev_pos + e_count,
                last_tok.reshape(1), new_finished, rng, out_tokens,
                out_hidden, out_finished, hist, n + e_count,
                _spec_gate_update(sp, a, gen_cfg))

    def cond(state):
        finished, n = state[5], state[11]
        return (n < t) & ~jnp.all(finished)

    def at_chunkable_img(state):
        prev_token, finished, n = state[4], state[5], state[11]
        return (jnp.all((prev_token == vocab.boi) & ~finished)
                & (n + n_img + 1 <= t))

    state = (cache, last_logits, last_hidden, last_pos,
             last_prompt_token.astype(jnp.int32), jnp.zeros((b,), bool), rng,
             out_tokens0, out_hidden0, out_finished0, hist0, jnp.int32(0),
             ((jnp.int32(0),) * 5 + (jnp.bool_(True),)))
    state = _run_decode_loop(state, cond, at_chunkable_img, single_step,
                             spec_step if spec_k else None, chunk_step,
                             enable_chunk, gen_cfg)
    return {"tokens": state[7], "hidden": state[8], "finished": state[9],
            "spec_rounds": state[12][0], "spec_accepted": state[12][1]}


def _run_decode_loop(state, cond, at_chunkable_img, single_step, spec_step,
                     chunk_step, enable_chunk, gen_cfg):
    """Drive the decode while-loops with every mode dispatch OUT of the hot
    body.  A ``lax.cond(branch_a | branch_b)`` in the per-token body makes
    every step ~2.5-8x slower (CPU tiny-model differential AND 13B-on-chip:
    plain decode read 9-19 tok/s with the per-step chunk cond vs 81.6 with
    this structure; the per-step adaptive-gate cond capped the gated arm at
    49 tok/s while spec-always hit 143 — scratch/plainloop_probe.py,
    NOTES_r5.md).  Both dispatches are therefore SEGMENTED:

      outer while (chunk segments)
        inner while (gate segments; only when spec_adaptive)
          leaf while: pure single_step / spec_step iterations, exiting
          when the gate flips, a chunkable <img> arrives, or decode ends
        chunk_step once per <img> boundary

    The gate flips at most once per spec round / cooldown window and the
    chunk fires once per image span, so each lax.cond here executes once
    per SEGMENT, not once per token.  Progress: every leaf loop runs >= 1
    step when entered (its cond is true at entry by construction), a
    chunkable <img> always fires chunk_step (advancing n by n_img + 1),
    and an <img> without room keeps at_chunkable_img false so the leaf
    loops single-step the forced ids exactly like the pre-chunk engine.
    """
    spec_adaptive = spec_step is not None and gen_cfg.spec_adaptive

    def gate_on(state):
        return state[12][5]

    def make_inner(loop_cond):
        """Run decode/spec steps until ``loop_cond`` goes false."""
        if spec_step is None:
            return lambda state: jax.lax.while_loop(loop_cond, single_step,
                                                    state)
        if not spec_adaptive:
            return lambda state: jax.lax.while_loop(loop_cond, spec_step,
                                                    state)

        def spec_run(state):
            return jax.lax.while_loop(lambda s: loop_cond(s) & gate_on(s),
                                      spec_step, state)

        def plain_run(state):
            return jax.lax.while_loop(lambda s: loop_cond(s) & ~gate_on(s),
                                      single_step, state)

        def mode_segment(state):
            return jax.lax.cond(gate_on(state), spec_run, plain_run, state)

        return lambda state: jax.lax.while_loop(loop_cond, mode_segment,
                                                state)

    if not enable_chunk:
        return make_inner(cond)(state)

    def inner_cond(state):
        return cond(state) & ~at_chunkable_img(state)

    inner = make_inner(inner_cond)

    def segment(state):
        state = inner(state)
        return jax.lax.cond(at_chunkable_img(state) & cond(state),
                            chunk_step, lambda s: s, state)

    return jax.lax.while_loop(cond, segment, state)


@functools.partial(
    jax.jit,
    static_argnames=("model", "gen_cfg", "vocab"),
    donate_argnames=("cache",))
def generate_tokens_cached(
    model: ContinuousLVLM,
    variables: Any,
    cache: Any,                    # preallocated KV cache [L, 1, C, ...]
    seg_embeds: jnp.ndarray,       # [1, Sb, D] RIGHT-padded prompt delta
    seg_start: jnp.ndarray,        # tokens already valid in the cache (LCP)
    seg_len: jnp.ndarray,          # valid tokens in the delta
    last_prompt_token: jnp.ndarray,  # [] int32
    rng: jnp.ndarray,
    gen_cfg: GenerationConfig,
    vocab: MultimodalVocab = DEFAULT_VOCAB,
    hist_ids: Optional[jnp.ndarray] = None,   # [C] ids at abs positions,
    # -1 in unfilled/stale slots — enables n-gram spec decode (greedy); the
    # CALLER must size the cache with spec_k rows of headroom past
    # p_total + max_new_tokens (verify forwards write k rows ahead)
):
    """Prefix-cached single-prompt generation (multi-turn chat).

    The reference (and ``generate_tokens``) re-prefills the full
    serialized history every turn; here the session's KV cache persists
    across turns at absolute positions [0, C) and only the NEW tokens (the
    suffix after the longest common prefix with the cached ids) run a
    prefill — attention against the cached prefix KV is mathematically
    identical to re-prefilling everything.  Stale KV beyond
    ``seg_start + seg_len`` (last turn's generated tokens that the history
    re-serialization replaced) is overwritten or masked by the valid
    window.  Decode then runs the same while-loop engine as
    ``generate_tokens`` — EOS early exit + forced-span chunking — writing
    generated KV at absolute positions, so the NEXT turn can extend the
    prefix further.

    Returns (out dict {tokens [1,T], hidden, finished}, cache, total_len).
    """
    c = cache[0].shape[2]
    t = gen_cfg.max_new_tokens
    n_img = gen_cfg.num_img_gen_tokens
    sb = seg_embeds.shape[1]
    spec_k = (gen_cfg.spec_k
              if (gen_cfg.spec_k > 0 and not gen_cfg.do_sample
                  and hist_ids is not None) else 0)

    positions = (seg_start + jnp.arange(sb))[None, :]
    kv_valid = (jnp.arange(c) < seg_start + seg_len)[None, :]
    logits, prefill_hidden, cache = model.apply(
        variables, seg_embeds, positions, kv_valid, cache, seg_start,
        method="llm_step")
    last = seg_len - 1
    last_logits = jax.lax.dynamic_index_in_dim(
        logits[0], last, 0, keepdims=False)[None].astype(jnp.float32)
    last_hidden = jax.lax.dynamic_index_in_dim(
        prefill_hidden[0], last, 0, keepdims=False)[None]
    p_total = seg_start + seg_len
    last_pos = (p_total - 1)[None]

    hid_dtype = prefill_hidden.dtype
    out_tokens0 = jnp.full((1, t), gen_cfg.pad_token_id, jnp.int32)
    out_hidden0 = jnp.zeros((1, t, last_hidden.shape[-1]), hid_dtype)
    out_finished0 = jnp.zeros((1, t), bool)

    enable_chunk = t >= n_img + 1
    forced_ids = jnp.concatenate(
        [jnp.arange(vocab.img_token_start, vocab.img_token_start + n_img),
         jnp.asarray([vocab.eoi])]).astype(jnp.int32)

    # history for n-gram drafting lives at ABSOLUTE cache positions:
    # hist[i] is the token at KV row i (stale/unfilled slots -1)
    hist0 = (hist_ids.reshape(-1).astype(jnp.int32) if spec_k
             else jnp.zeros((1,), jnp.int32))

    def decode_kv_valid(n_valid):
        return (jnp.arange(c) < p_total + n_valid)[None, :]

    def single_step(state):
        (cache, prev_logits, prev_hidden, prev_pos, prev_token, finished,
         rng, out_tokens, out_hidden, out_finished, hist, n) = state[:12]
        # plain step while the adaptive gate is off: tick the re-probe
        # cooldown (no-op sp passthrough when spec is disabled entirely)
        sp = _spec_cooldown_tick(state[12]) if spec_k else state[12]
        rng, sub = jax.random.split(rng)
        constrained = constrain_image_tokens(prev_token, prev_logits, vocab,
                                             n_img)
        token = _sample(constrained, sub, gen_cfg)
        token = jnp.where(finished, gen_cfg.pad_token_id, token)
        new_finished = finished | (token == gen_cfg.eos_token_id)
        out_tokens = jax.lax.dynamic_update_slice(
            out_tokens, token[:, None], (0, n))
        out_hidden = jax.lax.dynamic_update_slice(
            out_hidden, prev_hidden[:, None].astype(hid_dtype), (0, n, 0))
        out_finished = jax.lax.dynamic_update_slice(
            out_finished, new_finished[:, None], (0, n))
        if spec_k:
            # extend the n-gram history on gated-off steps too (same
            # hole-corruption bug as generate_tokens — see that fix)
            hist = jax.lax.dynamic_update_slice(hist, token,
                                                (p_total + n,))

        pos = prev_pos + 1
        embeds = model.apply(variables, token[:, None], method="embed_ids")
        logits, hidden, cache = model.apply(
            variables, embeds, pos[:, None], decode_kv_valid(n + 1), cache,
            p_total + n, method="llm_step")
        return (cache, logits[:, 0].astype(jnp.float32), hidden[:, 0], pos,
                token, new_finished, rng, out_tokens, out_hidden,
                out_finished, hist, n + 1, sp)

    def chunk_step(state):
        (cache, prev_logits, prev_hidden, prev_pos, prev_token, finished,
         rng, out_tokens, out_hidden, out_finished, hist, n) = state[:12]
        sp = state[12]
        ck = n_img + 1
        ids = forced_ids[None, :]
        embeds = model.apply(variables, ids, method="embed_ids")
        pos = prev_pos[:, None] + 1 + jnp.arange(ck)[None, :]
        logits, hidden, cache = model.apply(
            variables, embeds, pos, decode_kv_valid(n + ck), cache,
            p_total + n, method="llm_step")
        hid_w = jnp.concatenate(
            [prev_hidden[:, None], hidden[:, :n_img]], axis=1)
        out_tokens = jax.lax.dynamic_update_slice(out_tokens, ids, (0, n))
        out_hidden = jax.lax.dynamic_update_slice(
            out_hidden, hid_w.astype(hid_dtype), (0, n, 0))
        out_finished = jax.lax.dynamic_update_slice(
            out_finished, jnp.broadcast_to(finished[:, None], (1, ck)),
            (0, n))
        if spec_k:
            hist = jax.lax.dynamic_update_slice(hist, ids[0],
                                                (p_total + n,))
        return (cache, logits[:, -1].astype(jnp.float32), hidden[:, -1],
                prev_pos + ck, jnp.full((1,), vocab.eoi, jnp.int32), finished,
                rng, out_tokens, out_hidden, out_finished, hist, n + ck, sp)

    def spec_step(state):
        """Speculative round — same accept/emit logic as the spec_step in
        ``generate_tokens`` (see its docstring for the exactness argument),
        with absolute cache positions; the caller guaranteed spec_k rows of
        cache headroom past p_total + t."""
        (cache, prev_logits, prev_hidden, prev_pos, prev_token, finished,
         rng, out_tokens, out_hidden, out_finished, hist, n) = state[:12]
        sp = state[12]
        k = spec_k
        constrained = constrain_image_tokens(prev_token, prev_logits, vocab,
                                             n_img)
        token0 = jnp.argmax(constrained, axis=-1).astype(jnp.int32)
        drafts = _ngram_draft(hist, p_total + n, token0[0], k,
                              gen_cfg.spec_ngram)
        v = jnp.concatenate([token0, drafts])
        embeds = model.apply(variables, jnp.maximum(v, 0)[None, :],
                             method="embed_ids")
        pos = prev_pos[:, None] + 1 + jnp.arange(k + 1)[None, :]
        logits_v, hidden_v, cache = model.apply(
            variables, embeds, pos, decode_kv_valid(n + k + 1), cache,
            p_total + n, method="llm_step")
        logits_v = logits_v.astype(jnp.float32)
        exp_next = jnp.argmax(
            constrain_image_tokens(v, logits_v[0], vocab, n_img),
            axis=-1).astype(jnp.int32)
        stop_prev = ((v[:k] == gen_cfg.eos_token_id) | (v[:k] == vocab.boi))
        acc = (drafts == exp_next[:k]) & ~stop_prev
        a = jnp.sum(jnp.cumprod(acc.astype(jnp.int32)))
        e_count = a + 1
        i_vec = jnp.arange(k + 1)
        write_idx = jnp.where(i_vec < e_count, n + i_vec, t)
        fin_w = v == gen_cfg.eos_token_id
        hid_w = jnp.concatenate([prev_hidden[:, None], hidden_v[:, :k]],
                                axis=1)[0]
        out_tokens = out_tokens.at[0, write_idx].set(v, mode="drop")
        out_hidden = out_hidden.at[0, write_idx].set(
            hid_w.astype(hid_dtype), mode="drop")
        out_finished = out_finished.at[0, write_idx].set(fin_w, mode="drop")
        hist = hist.at[jnp.where(i_vec < e_count, p_total + n + i_vec,
                                 hist.shape[0])].set(v, mode="drop")

        last_tok = v[a]
        new_logits = jax.lax.dynamic_index_in_dim(
            logits_v[0], a, 0, keepdims=False)[None]
        new_hidden = jax.lax.dynamic_index_in_dim(
            hidden_v[0], a, 0, keepdims=False)[None]
        new_finished = finished | (last_tok == gen_cfg.eos_token_id)
        return (cache, new_logits, new_hidden, prev_pos + e_count,
                last_tok.reshape(1), new_finished, rng, out_tokens,
                out_hidden, out_finished, hist, n + e_count,
                _spec_gate_update(sp, a, gen_cfg))

    def cond(state):
        finished, n = state[5], state[11]
        return (n < t) & ~jnp.all(finished)

    def at_chunkable_img(state):
        prev_token, finished, n = state[4], state[5], state[11]
        return (jnp.all((prev_token == vocab.boi) & ~finished)
                & (n + n_img + 1 <= t))

    state = (cache, last_logits, last_hidden, last_pos,
             last_prompt_token.reshape(1).astype(jnp.int32),
             jnp.zeros((1,), bool), rng,
             out_tokens0, out_hidden0, out_finished0, hist0, jnp.int32(0),
             ((jnp.int32(0),) * 5 + (jnp.bool_(True),)))
    state = _run_decode_loop(state, cond, at_chunkable_img, single_step,
                             spec_step if spec_k else None, chunk_step,
                             enable_chunk, gen_cfg)
    return ({"tokens": state[7], "hidden": state[8], "finished": state[9],
             "spec_rounds": state[12][0], "spec_accepted": state[12][1]},
            state[0], p_total + state[11])


@functools.partial(jax.jit, static_argnames=("model", "gen_cfg", "vocab"))
def generate_tokens_beam(
    model: ContinuousLVLM,
    variables: Any,
    prompt_embeds: jnp.ndarray,    # [B, P, D]
    prompt_mask: jnp.ndarray,      # [B, P] bool, LEFT-padded
    last_prompt_token: jnp.ndarray,  # [B]
    gen_cfg: GenerationConfig,
    vocab: MultimodalVocab = DEFAULT_VOCAB,
):
    """Beam search (HF ``num_beams>1`` parity; the reference's configs carry
    the knob even though every eval script runs greedy).

    One prefill at batch B, then the cache is tiled to B*K beam rows and the
    whole beam state (KV cache included) is re-gathered by parent beam every
    scan step — the standard jit-compatible formulation.  Finished beams
    emit pad with frozen scores and keep competing in the joint top-k pool.

    Returns {tokens [T, B, K], parents [T, B, K], hidden [T, B*K, D],
    scores [B, K]}; host-side backtracking reconstructs the best beam
    (see ``_backtrack_beam``).
    """
    k = gen_cfg.num_beams
    b, p, d = prompt_embeds.shape
    t = gen_cfg.max_new_tokens
    llm_cfg = model.cfg.llm
    bk = b * k

    cache = init_kv_cache(llm_cfg, b, p + t)
    positions = jnp.maximum(
        jnp.cumsum(prompt_mask.astype(jnp.int32), axis=-1) - 1, 0)
    kv_valid_prefill = jnp.concatenate(
        [prompt_mask, jnp.zeros((b, t), bool)], axis=-1)
    logits, prefill_hidden, cache = model.apply(
        variables, prompt_embeds, positions, kv_valid_prefill, cache, 0,
        method="llm_step")

    # beam expansion: row-major [b, k] blocks
    def tile_rows(x, axis=0):
        return jnp.repeat(x, k, axis=axis)

    cache = jax.tree.map(lambda c: tile_rows(c, axis=1), cache)
    prompt_mask_k = tile_rows(prompt_mask)
    last_logits = tile_rows(logits[:, -1].astype(jnp.float32))
    last_hidden = tile_rows(prefill_hidden[:, -1])
    last_pos = tile_rows(positions[:, -1])
    prev_token = tile_rows(last_prompt_token.astype(jnp.int32))
    scores = jnp.full((b, k), -jnp.inf, jnp.float32).at[:, 0].set(0.0)
    v = logits.shape[-1]

    def step(carry, step_idx):
        (cache, prev_logits, prev_hidden, prev_pos, prev_token, finished,
         scores) = carry
        constrained = constrain_image_tokens(
            prev_token, prev_logits, vocab, gen_cfg.num_img_gen_tokens)
        logprobs = jax.nn.log_softmax(constrained, axis=-1)     # [bk, V]
        # finished beams: pad costs 0, everything else -inf
        pad_row = jnp.full((v,), -jnp.inf).at[gen_cfg.pad_token_id].set(0.0)
        logprobs = jnp.where(finished[:, None], pad_row[None, :], logprobs)

        total = scores.reshape(bk, 1) + logprobs                # [bk, V]
        top_scores, top_idx = jax.lax.top_k(total.reshape(b, k * v), k)
        parent = top_idx // v                                   # [b, k]
        token = (top_idx % v).astype(jnp.int32)                 # [b, k]
        parent_rows = (jnp.arange(b)[:, None] * k + parent).reshape(-1)

        # re-gather ALL beam state by parent
        cache = jax.tree.map(lambda c: jnp.take(c, parent_rows, axis=1),
                             cache)
        hidden_src = jnp.take(prev_hidden, parent_rows, axis=0)
        pos = jnp.take(prev_pos, parent_rows, axis=0) + 1
        fin_src = jnp.take(finished, parent_rows, axis=0)
        token_flat = token.reshape(-1)
        new_finished = fin_src | (token_flat == gen_cfg.eos_token_id)

        embeds = model.apply(variables, token_flat[:, None],
                             method="embed_ids")
        kv_valid = jnp.concatenate(
            [prompt_mask_k,
             jnp.broadcast_to(jnp.arange(t)[None, :] <= step_idx,
                              (bk, t))], axis=-1)
        logits, hidden, cache = model.apply(
            variables, embeds, pos[:, None], kv_valid, cache, p + step_idx,
            method="llm_step")

        out = (token, parent, hidden_src, new_finished)
        return (cache, logits[:, 0].astype(jnp.float32), hidden[:, 0], pos,
                token_flat, new_finished, top_scores), out

    carry = (cache, last_logits, last_hidden, last_pos, prev_token,
             jnp.zeros((bk,), bool), scores)
    carry, (tokens, parents, hidden, finished) = jax.lax.scan(
        step, carry, jnp.arange(t))
    return {"tokens": tokens, "parents": parents, "hidden": hidden,
            "scores": carry[-1], "finished": finished}


def _backtrack_beam(out: Dict[str, Any], gen_cfg: GenerationConfig,
                    batch_idx: int = 0):
    """Host-side: walk every final slot's parent pointers back into its
    true token chain, score chains under the HF length penalty
    (sum_logprob / len**alpha), and return the winner's (tokens [T],
    hidden [T, D])."""
    tokens = np.asarray(out["tokens"])[:, batch_idx]    # [T, K]
    parents = np.asarray(out["parents"])[:, batch_idx]  # [T, K]
    scores = np.asarray(out["scores"])[batch_idx]       # [K]
    t, k = tokens.shape

    def chain(final_slot):
        seq = np.zeros((t,), np.int64)
        hid_rows = np.zeros((t,), np.int64)
        slot = final_slot
        for i in range(t - 1, -1, -1):
            seq[i] = tokens[i, slot]
            hid_rows[i] = batch_idx * k + slot
            slot = int(parents[i, slot])
        return seq, hid_rows

    best, best_val = 0, -np.inf
    chains = []
    for slot in range(k):
        seq, hid_rows = chain(slot)
        eos = np.where(seq == gen_cfg.eos_token_id)[0]
        length = int(eos[0]) + 1 if eos.size else t
        val = float(scores[slot]) / max(length, 1) ** gen_cfg.length_penalty
        chains.append((seq, hid_rows))
        if val > best_val:
            best, best_val = slot, val

    seq, hid_rows = chains[best]
    hidden = out["hidden"][np.arange(t), hid_rows]      # [T, D]
    return seq, hidden, best


def _trim_and_spans(tokens: np.ndarray, gen_cfg: GenerationConfig,
                    vocab: MultimodalVocab):
    """Per-sequence host post-processing: eos trim + </img> span indices."""
    eos_positions = np.where(tokens == gen_cfg.eos_token_id)[0]
    end = int(eos_positions[0]) + 1 if eos_positions.size else len(tokens)
    tokens = tokens[:end]
    n_img = gen_cfg.num_img_gen_tokens
    eoi_indices = [int(i) for i in np.where(tokens == vocab.eoi)[0]
                   if i >= n_img]
    return tokens, eoi_indices


def build_result(tokens: np.ndarray, eoi_indices, img_gen_feat, tokenizer,
                 vocab: MultimodalVocab, num_img_gen_tokens: int
                 ) -> Dict[str, Any]:
    """Assemble the engine-common result dict from trimmed tokens + spans —
    the single source of truth for text masking (forced image ids and
    ``<img>`` markers dropped; reference: seed_x.py:201-215), shared by
    ``generate_batch``, the continuous engine's harvest, and the
    prefix-cached chat path."""
    text_mask = np.ones(len(tokens), bool)
    for j in eoi_indices:
        text_mask[j - num_img_gen_tokens:j] = False
    text_mask[tokens == vocab.boi] = False
    return {"text": tokenizer.decode(tokens[text_mask]),
            "has_img_output": bool(eoi_indices),
            "img_gen_feat": img_gen_feat,
            "num_gen_imgs": len(eoi_indices),
            "tokens": tokens}


def generate_batch(
    model: ContinuousLVLM,
    variables: Any,
    tokenizer,
    requests,                        # list of per-prompt dicts (see below)
    gen_cfg: Optional[GenerationConfig] = None,
    rng: Optional[jnp.ndarray] = None,
):
    """Batched generation: ONE prefill+decode launch for many prompts.

    The reference's HF ``generate`` loop is strictly single-prompt
    (eval_img2text_seed_x_i.py); here the jitted engine is batch-native and
    only the span bookkeeping is per-row.  Every request is a dict:

      {"input_ids": list[int],
       "image_embeds":     [N_i, T, vit_dim] or None,
       "embeds_cmp_mask":  [N_i] bool or None,
       "ids_cmp_mask":     [S_i] bool or None,
       "patch_positions":  [N_i, 2] or None}

    Prompts are left-padded to one shared bucket; per-request image tiles are
    concatenated in batch order, matching the batch-major scatter in
    ``embed_with_images``.  Returns a list of per-request result dicts with
    the same contract as ``generate``.
    """
    vocab = tokenizer.vocab
    gen_cfg = gen_cfg or GenerationConfig(eos_token_id=tokenizer.eos_token_id,
                                          pad_token_id=tokenizer.pad_token_id)
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    b = len(requests)
    lens = [len(r["input_ids"]) for r in requests]
    s_max = max(lens)
    bucket = next((x for x in gen_cfg.prompt_buckets if x >= s_max), s_max)

    ids_padded = np.full((b, bucket), gen_cfg.pad_token_id, np.int32)
    mask = np.zeros((b, bucket), bool)
    cmp_padded = np.zeros((b, bucket), bool)
    any_cmp = False
    for i, r in enumerate(requests):
        s = lens[i]
        ids_padded[i, bucket - s:] = np.asarray(r["input_ids"], np.int32)
        mask[i, bucket - s:] = True
        cm = r.get("ids_cmp_mask")
        if cm is not None:
            cmp_padded[i, bucket - s:] = np.asarray(cm, bool)
            any_cmp = True

    img_parts = [r["image_embeds"] for r in requests
                 if r.get("image_embeds") is not None]
    image_embeds = jnp.concatenate(img_parts) if img_parts else None
    embeds_cmp = patch_pos = None
    if image_embeds is not None:
        embeds_cmp = np.concatenate(
            [np.asarray(r["embeds_cmp_mask"], bool) for r in requests
             if r.get("image_embeds") is not None])
        pp_parts = [(r.get("patch_positions"), r["image_embeds"])
                    for r in requests if r.get("image_embeds") is not None]
        if any(p is not None for p, _ in pp_parts):
            # missing positions default to the center coordinate (the
            # reference's thumbnail value) so one request can't strip the
            # patch-position embedding from the whole batch
            patch_pos = jnp.concatenate([
                jnp.asarray(p) if p is not None
                else jnp.full((img.shape[0], 2), 0.5, jnp.float32)
                for p, img in pp_parts])

    prompt_embeds = model.apply(
        variables, jnp.asarray(ids_padded),
        image_embeds,
        jnp.asarray(cmp_padded) if any_cmp else None,
        jnp.asarray(embeds_cmp) if embeds_cmp is not None else None,
        patch_pos,
        method="embed_with_images")

    last_tokens = np.asarray([r["input_ids"][-1] for r in requests], np.int32)
    if gen_cfg.num_beams > 1:
        bout = generate_tokens_beam(model, variables, prompt_embeds,
                                    jnp.asarray(mask),
                                    jnp.asarray(last_tokens), gen_cfg, vocab)
        per_row = [_backtrack_beam(bout, gen_cfg, i)[:2] for i in range(b)]
        all_tokens = np.stack([p[0] for p in per_row])
        row_hidden = [p[1] for p in per_row]       # each [T, D]
    else:
        out = generate_tokens(model, variables, prompt_embeds,
                              jnp.asarray(mask), jnp.asarray(last_tokens),
                              rng, gen_cfg, vocab,
                              prompt_ids=jnp.asarray(ids_padded))
        all_tokens = np.asarray(out["tokens"])
        row_hidden = [out["hidden"][i] for i in range(b)]

    # Per-row span bookkeeping; ONE output-resampler launch for all spans.
    n_img = gen_cfg.num_img_gen_tokens
    rows = []
    span_list = []
    for i in range(b):
        tokens, eoi_indices = _trim_and_spans(all_tokens[i], gen_cfg, vocab)
        rows.append((tokens, eoi_indices))
        span_list.extend((i, j) for j in eoi_indices)
    img_gen_all = None
    if span_list:
        spans = jnp.stack([jnp.asarray(row_hidden[i])[j - n_img:j]
                           for i, j in span_list])
        img_gen_all = model.apply(variables, spans,
                                  method="decode_image_feats")

    results = []
    consumed = 0
    for tokens, eoi_indices in rows:
        img_gen_feat = None
        if eoi_indices:
            img_gen_feat = img_gen_all[consumed:consumed + len(eoi_indices)]
            consumed += len(eoi_indices)
        results.append(build_result(tokens, eoi_indices, img_gen_feat,
                                    tokenizer, vocab, n_img))
    if gen_cfg.num_beams <= 1 and "spec_rounds" in out:
        # speculative-decoding observability (B=1 feature; counters are
        # engine-global): lets sessions apply acceptance-based policy
        for r in results:
            r["spec_rounds"] = int(out["spec_rounds"])
            r["spec_accepted"] = int(out["spec_accepted"])
    return results


def generate(
    model: ContinuousLVLM,
    variables: Any,
    tokenizer,
    input_ids,                       # list[int] or [1, S] array
    image_embeds: Optional[jnp.ndarray] = None,
    embeds_cmp_mask: Optional[np.ndarray] = None,
    ids_cmp_mask: Optional[np.ndarray] = None,
    patch_positions: Optional[jnp.ndarray] = None,
    gen_cfg: Optional[GenerationConfig] = None,
    rng: Optional[jnp.ndarray] = None,
) -> Dict[str, Any]:
    """Host-side orchestration mirroring ``ContinuousLVLM.generate``
    (reference: seed_x.py:130-223).  Returns {text, has_img_output,
    img_gen_feat, num_gen_imgs}.  Single-prompt sugar over
    ``generate_batch``.
    """
    ids = np.asarray(input_ids)
    if ids.ndim == 2:
        if ids.shape[0] != 1:
            raise ValueError("generate() is single-prompt; use "
                             "generate_batch for multiple prompts")
        ids = ids[0]
    cm = np.asarray(ids_cmp_mask) if ids_cmp_mask is not None else None
    if cm is not None and cm.ndim == 2:
        cm = cm[0]
    request = {
        "input_ids": list(ids),
        "image_embeds": image_embeds,
        "embeds_cmp_mask": embeds_cmp_mask,
        "ids_cmp_mask": cm,
        "patch_positions": patch_positions,
    }
    return generate_batch(model, variables, tokenizer, [request],
                          gen_cfg=gen_cfg, rng=rng)[0]
