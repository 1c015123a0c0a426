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
    eos_token_id: int = 2
    pad_token_id: int = 0
    prompt_buckets: tuple = (128, 256, 512, 1024)


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

    # Forced: winner gets max + 10 (reference: generation.py:26).
    win = jnp.max(logits, axis=-1, keepdims=True) + 10.0
    safe_forced = jnp.maximum(forced, 0)
    forced_logits = jnp.where(
        jax.nn.one_hot(safe_forced, v, dtype=bool), win, logits)

    return jnp.where(is_forced[:, None], forced_logits, unforced_logits)


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
):
    """Returns dict with tokens [B, T], hidden [B, T, D], finished [B, T]."""
    b, p, d = prompt_embeds.shape
    t = gen_cfg.max_new_tokens
    llm_cfg = model.cfg.llm
    cache = init_kv_cache(llm_cfg, b, p + t)

    positions = jnp.maximum(
        jnp.cumsum(prompt_mask.astype(jnp.int32), axis=-1) - 1, 0)
    kv_valid_prefill = jnp.concatenate(
        [prompt_mask, jnp.zeros((b, t), bool)], axis=-1)

    logits, prefill_hidden, cache = model.apply(
        variables, prompt_embeds, positions, kv_valid_prefill, cache, 0,
        method="llm_step")
    last_logits = logits[:, -1].astype(jnp.float32)
    last_hidden = prefill_hidden[:, -1]
    last_pos = positions[:, -1]

    def step(carry, step_idx):
        (cache, prev_logits, prev_hidden, prev_pos, prev_token, finished,
         rng) = carry
        rng, sub = jax.random.split(rng)
        constrained = constrain_image_tokens(
            prev_token, prev_logits, vocab, gen_cfg.num_img_gen_tokens)
        token = _sample(constrained, sub, gen_cfg)
        token = jnp.where(finished, gen_cfg.pad_token_id, token)
        new_finished = finished | (token == gen_cfg.eos_token_id)

        pos = prev_pos + 1
        embeds = model.apply(variables, token[:, None], method="embed_ids")
        kv_valid = jnp.concatenate(
            [prompt_mask,
             jnp.arange(t)[None, :] <= step_idx], axis=-1)
        logits, hidden, cache = model.apply(
            variables, embeds, pos[:, None], kv_valid, cache, p + step_idx,
            method="llm_step")
        # Emit the hidden state that PRODUCED this token, matching the
        # reference alignment (seed_x.py:196-207: hidden[i] -> token[i]).
        out = (token, prev_hidden, new_finished)
        return (cache, logits[:, 0].astype(jnp.float32), hidden[:, 0], pos,
                token, new_finished, rng), out

    carry = (cache, last_logits, last_hidden, last_pos,
             last_prompt_token.astype(jnp.int32),
             jnp.zeros((b,), bool), rng)
    _, (tokens, hidden, finished) = jax.lax.scan(
        step, carry, jnp.arange(t))

    tokens = jnp.swapaxes(tokens, 0, 1)       # [B, T]
    hidden = jnp.swapaxes(hidden, 0, 1)       # [B, T, D]
    finished = jnp.swapaxes(finished, 0, 1)
    return {"tokens": tokens, "hidden": hidden, "finished": finished}


def generate(
    model: ContinuousLVLM,
    variables: Any,
    tokenizer,
    input_ids,                       # list[int] or [B, S] array
    image_embeds: Optional[jnp.ndarray] = None,
    embeds_cmp_mask: Optional[np.ndarray] = None,
    ids_cmp_mask: Optional[np.ndarray] = None,
    patch_positions: Optional[jnp.ndarray] = None,
    gen_cfg: Optional[GenerationConfig] = None,
    rng: Optional[jnp.ndarray] = None,
) -> Dict[str, Any]:
    """Host-side orchestration mirroring ``ContinuousLVLM.generate``
    (reference: seed_x.py:130-223).  Returns {text, has_img_output,
    img_gen_feat, num_gen_imgs}.
    """
    vocab = tokenizer.vocab
    gen_cfg = gen_cfg or GenerationConfig(eos_token_id=tokenizer.eos_token_id,
                                          pad_token_id=tokenizer.pad_token_id)
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    ids = np.asarray(input_ids)
    if ids.ndim == 1:
        ids = ids[None]
    b, s = ids.shape
    if b != 1:
        # the reference inference scripts are single-prompt too
        # (eval_img2text_seed_x_i.py); batched serving needs per-sequence
        # span extraction — tracked for the serving engine.
        raise NotImplementedError("generate() host post-processing is "
                                  "single-prompt; run prompts separately")

    # Left-pad to the smallest bucket >= s (static shapes for jit reuse).
    bucket = next((x for x in gen_cfg.prompt_buckets if x >= s), s)
    pad = bucket - s
    ids_padded = np.concatenate(
        [np.full((b, pad), gen_cfg.pad_token_id, ids.dtype), ids], axis=1)
    mask = np.concatenate(
        [np.zeros((b, pad), bool), np.ones((b, s), bool)], axis=1)
    cmp_mask_padded = None
    if ids_cmp_mask is not None:
        cm = np.asarray(ids_cmp_mask)
        if cm.ndim == 1:
            cm = cm[None]
        cmp_mask_padded = np.concatenate(
            [np.zeros((b, pad), bool), cm], axis=1)

    prompt_embeds = model.apply(
        variables, jnp.asarray(ids_padded),
        image_embeds,
        jnp.asarray(cmp_mask_padded) if cmp_mask_padded is not None else None,
        jnp.asarray(embeds_cmp_mask) if embeds_cmp_mask is not None else None,
        patch_positions,
        method="embed_with_images")

    out = generate_tokens(model, variables, prompt_embeds, jnp.asarray(mask),
                          jnp.asarray(ids[:, -1]), rng, gen_cfg, vocab)
    tokens = np.asarray(out["tokens"])[0]
    hidden = out["hidden"][0]

    # Trim at eos.
    eos_positions = np.where(tokens == gen_cfg.eos_token_id)[0]
    end = int(eos_positions[0]) + 1 if eos_positions.size else len(tokens)
    tokens = tokens[:end]

    # Collect image spans: 64 hidden states before each </img>
    # (reference: seed_x.py:199-210).
    eoi_indices = np.where(tokens == vocab.eoi)[0]
    n_img = gen_cfg.num_img_gen_tokens
    eoi_indices = [i for i in eoi_indices if i >= n_img]
    img_gen_feat = None
    if eoi_indices:
        spans = jnp.stack([hidden[i - n_img:i] for i in eoi_indices])
        img_gen_feat = model.apply(variables, spans, method="decode_image_feats")

    # Text: drop forced image tokens and <img> markers (seed_x.py:201-215).
    text_mask = np.ones(len(tokens), bool)
    for i in eoi_indices:
        text_mask[i - n_img:i] = False
    text_mask[tokens == vocab.boi] = False
    text_tokens = tokens[text_mask]
    text = tokenizer.decode(text_tokens)

    return {
        "text": text,
        "has_img_output": bool(eoi_indices),
        "img_gen_feat": img_gen_feat,
        "num_gen_imgs": len(eoi_indices),
        "tokens": tokens,
    }
