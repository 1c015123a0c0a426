"""LLaMA2 causal LM backbone, TPU-native.

Capability parity with the reference's custom LLaMA copy
(reference: src/models/mllm/modeling_llama_xformer.py): RoPE, RMSNorm, SwiGLU
MLP, causal attention, the *dual input contract* (token ids AND a full
``inputs_embeds`` stream with image embeddings spliced in,
modeling_llama_xformer.py:496-498,748-780), per-block gradient checkpointing,
and LoRA on all seven projection matrices
(configs/clm_models/llm_seed_x_lora.yaml:16-23).

TPU-first design:
  * blocks under ``nn.scan`` (+ optional ``nn.remat``) — one compiled block,
    params stacked on a leading ``layers`` axis,
  * Pallas flash attention on the training/prefill path (seedx_tpu/ops),
  * a *preallocated* KV cache threaded functionally through the scan — the
    HF python ``generate`` loop is replaced by a jitted prefill + ``lax.scan``
    decode (see seedx_tpu/models/generation.py),
  * parameters carry logical sharding axes; FSDP/TP layouts come from
    seedx_tpu/parallel rules.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from seedx_tpu.models.layers import LoRADense, PDense, RMSNorm, default_init
from seedx_tpu.ops.attention import dot_product_attention
from seedx_tpu.ops.rope import apply_rope, rope_cos_sin

IGNORE_INDEX = -100  # label value excluded from the LM loss (HF convention)


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32330  # 32000 + 330 multimodal tokens (llm_seed_x_lora.yaml:25)
    hidden_size: int = 5120
    intermediate_size: int = 13824
    num_layers: int = 40
    num_heads: int = 40
    num_kv_heads: int = 40
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    max_position_embeddings: int = 2048
    lora_rank: int = 0
    lora_alpha: float = 32.0
    lora_dropout: float = 0.05
    # IA3 tuning (the reference's vendored PEFT fork ships it as an
    # alternative tuner, proj/peft/src/peft/tuners/ia3.py; no SEED-X flow
    # uses it, provided for fork parity): ones-init rescaling vectors on
    # the fork's llama target set — k_proj/v_proj outputs and the
    # down_proj input (feedforward_modules semantics).  Train with
    # trainable_patterns=(r".*ia3_scale$", ...).
    ia3: bool = False
    # "none" | "int8" (projection weights) | "int8_full" (also the embedding
    # table + lm_head — frees another ~330M of a 16G chip for batched decode)
    # | "int4" (nibble-packed projections with group scales, embedding +
    # lm_head int8 — the 13B weight stream drops to ~6.6G, unlocking batched
    # serving on one 16G chip)
    quantization: str = "none"
    kv_quantization: str = "none"  # "none" | "int8" KV cache (serving)
    # int4 seq==1 decode via the stacked-weight Pallas kernel (bypasses the
    # nn.scan per-layer weight slice; see models/decode_stacked.py).
    # "auto" = on TPU only; "force" = always (interpret-mode kernel off-TPU,
    # for parity tests); "never" = keep the scan path.
    stacked_decode: str = "auto"
    # Ragged decode attention (ops/decode_attention.py) inside the stacked
    # decode loop: stream ONLY each row's valid KV window [start, end) from
    # HBM instead of the full max_len cache (XLA's seq==1 attention reads
    # everything).  Batched serving reads ~mean(len)/max_len of the cache.
    # Same "auto" | "force" | "never" semantics as stacked_decode.
    decode_attention: str = "auto"
    attention_impl: str = "auto"
    remat: bool = True
    scan_layers: bool = True
    # Pad the embedding table + lm_head rows up to this size (0 = exact).
    # 32330 = 2*5*53*61 caps the `tensor` mesh axis at 2 (or 5); padding to
    # e.g. 32336 = 8*4042 unlocks 8-way tensor parallelism for the vocab-
    # sharded embedding/head.  Pad rows are zero-init and their logits are
    # masked to -1e9, so outputs are identical to the unpadded model.
    vocab_pad_to: int = 0
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def padded_vocab_size(self) -> int:
        return max(self.vocab_size, self.vocab_pad_to)


def llama2_13b(**overrides) -> LlamaConfig:
    """SEED-X backbone: LLaMA2-13B with the 32330-token multimodal vocab."""
    return LlamaConfig(**overrides)


def llama_debug(**overrides) -> LlamaConfig:
    """Tiny random model, the analogue of the reference DEBUG_FLAG path
    (reference: src/models/mllm/peft_models.py:38-47)."""
    kw = dict(vocab_size=32330, hidden_size=256, intermediate_size=512,
              num_layers=2, num_heads=4, num_kv_heads=4,
              max_position_embeddings=2048)
    kw.update(overrides)
    return LlamaConfig(**kw)


# KV cache: per-layer stacked (k, v) stored FLAT as [layers, batch, max_len,
# kv_heads * head_dim] — the fused trailing dim keeps seq in the sublane
# tile and heads*dim in lanes, so no batch size hits TPU tiling padding (a
# [.., batch, .., heads, dim] layout put batch in sublanes and 2x-padded
# small serving batches).  The per-head view is a free row-major reshape.
# int8 quantization (kv_quantization="int8") adds per-(position, head)
# scales and halves both cache footprint and per-step read traffic; decode
# is HBM-bandwidth bound, and on a 16G v5e the bf16 cache is exactly what
# keeps a batched 13B from fitting.
KVCache = Tuple[jnp.ndarray, ...]


def kv_scale_width(cfg: LlamaConfig) -> int:
    """Lane width of the int8-KV scale leaves.

    With ragged decode attention enabled (``decode_attention`` "auto" or
    "force"): ``num_kv_heads`` rounded up to 128 — the kernel DMAs scale
    tiles directly out of the standing buffer, and Mosaic requires DMA'd
    minor dims to be 128-multiples (ops/decode_attention.py); pad lanes
    are zero and every XLA consumer slices ``[..., :num_kv_heads]`` back.

    With ``decode_attention == "never"`` the XLA path is the only reader,
    so the compact ``num_kv_heads`` layout is kept — the 128-lane pad
    would otherwise ~3x the scale HBM footprint and per-step scale DMA at
    the 13B serving geometry (40 kv heads) for no consumer."""
    if cfg.decode_attention == "never":
        return cfg.num_kv_heads
    return -(-cfg.num_kv_heads // 128) * 128


def init_kv_cache(cfg: LlamaConfig, batch: int, max_len: int,
                  dtype=None) -> KVCache:
    dtype = dtype or cfg.dtype
    flat = (cfg.num_layers, batch, max_len,
            cfg.num_kv_heads * cfg.head_dim)
    if cfg.kv_quantization == "int8":
        sshape = flat[:-1] + (kv_scale_width(cfg),)
        return (jnp.zeros(flat, jnp.int8), jnp.zeros(flat, jnp.int8),
                jnp.zeros(sshape, dtype), jnp.zeros(sshape, dtype))
    return jnp.zeros(flat, dtype), jnp.zeros(flat, dtype)


def init_paged_kv_pool(cfg: LlamaConfig, pool_tokens: int,
                       dtype=None) -> KVCache:
    """Shared paged KV pool: same leaves as ``init_kv_cache`` minus the
    per-slot batch axis — [layers, pool_tokens, kv_heads*head_dim] (+ scale
    leaves).  Rows are handed out in fixed-size tiles via block tables
    (inference/continuous.py paged mode; attention reads them through
    ``ops/decode_attention.py``'s block-table DMA indexing)."""
    dtype = dtype or cfg.dtype
    flat = (cfg.num_layers, pool_tokens, cfg.num_kv_heads * cfg.head_dim)
    if cfg.kv_quantization == "int8":
        sshape = flat[:-1] + (kv_scale_width(cfg),)
        return (jnp.zeros(flat, jnp.int8), jnp.zeros(flat, jnp.int8),
                jnp.zeros(sshape, dtype), jnp.zeros(sshape, dtype))
    return jnp.zeros(flat, dtype), jnp.zeros(flat, dtype)


def quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-(position, head) int8: scale = amax/127 over head_dim."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.round(xf / scale).astype(jnp.int8)
    return q, scale.astype(x.dtype)


class LlamaBlock(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, layer_cache, cos, sin, kv_valid, cache_index,
                 write_widths=None):
        """One decoder layer.

        Args:
          x: [batch, seq, hidden].
          layer_cache: (k, v) [batch, max_len, kv_heads, head_dim] or None.
          cos/sin: rope tables [batch, seq, head_dim].
          kv_valid: [batch, kv_len] bool or None.
          cache_index: scalar write offset into the cache (0 for no-cache),
            or a [batch] int32 vector for per-row offsets — the continuous
            batching decode path, where every slot sits at its own depth
            (requires seq == 1 unless ``write_widths`` is given).
          write_widths: [batch] int32 or None — the fused prefill+decode
            step (inference/continuous.py): row b's window slots
            [0, write_widths[b]) hold real tokens written to the cache at
            [cache_index[b], cache_index[b]+width); slots past the width
            are garbage whose KV writes are DROPPED (out-of-bounds scatter)
            and whose outputs the caller discards.
        """
        cfg = self.cfg
        b, s, _ = x.shape

        # IA3 target set = the PEFT fork's llama defaults: k/v outputs,
        # down_proj input (ia3.py feedforward_modules)
        _ia3 = {"k_proj": "out", "v_proj": "out", "down_proj": "in"} \
            if cfg.ia3 else {}

        def dense(name, features, in_axis, out_axis):
            return LoRADense(
                features, kernel_axes=(in_axis, out_axis), use_bias=False,
                lora_rank=cfg.lora_rank, lora_alpha=cfg.lora_alpha,
                lora_dropout=cfg.lora_dropout, quantize=cfg.quantization,
                ia3=_ia3.get(name), dtype=cfg.dtype,
                param_dtype=cfg.param_dtype, name=name)

        h = RMSNorm(epsilon=cfg.rms_eps, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, name="input_layernorm")(x)

        q = dense("q_proj", cfg.num_heads * cfg.head_dim, "embed", "heads")(h)
        k = dense("k_proj", cfg.num_kv_heads * cfg.head_dim, "embed", "heads")(h)
        v = dense("v_proj", cfg.num_kv_heads * cfg.head_dim, "embed", "heads")(h)
        q = q.reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)

        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        new_cache = None
        if layer_cache is not None:
            nh, hd = cfg.num_kv_heads, cfg.head_dim
            per_row = getattr(cache_index, "ndim", 0) == 1
            if per_row and s != 1 and write_widths is None:
                raise ValueError("per-row cache_index requires seq == 1 "
                                 "(or write_widths for the fused step)")
            at = (0, cache_index, 0)

            def _store(buf, val):
                """Write val [b, s, f] at the cache offset(s)."""
                if per_row and write_widths is not None:
                    # ragged window write: row b's slots [0, width_b) land
                    # at [off_b, off_b+width_b); garbage slots scatter OUT
                    # OF BOUNDS and are dropped — no clamp collisions with
                    # real writes at the cache tail
                    idx = cache_index[:, None] + jnp.arange(s)[None, :]
                    idx = jnp.where(
                        jnp.arange(s)[None, :] < write_widths[:, None],
                        idx, buf.shape[1])
                    return buf.at[jnp.arange(b)[:, None], idx].set(
                        val, mode="drop")
                if per_row:
                    return buf.at[jnp.arange(b), cache_index].set(val[:, 0])
                return jax.lax.dynamic_update_slice(buf, val, at)

            if len(layer_cache) == 4:      # int8 cache + per-entry scales
                ck, cv, ks, vs = layer_cache
                max_len = ck.shape[1]
                sw = ks.shape[-1]          # lane-padded (kv_scale_width)
                kq, ksc = quantize_kv(k)
                vq, vsc = quantize_kv(v)

                def _padh(sc, dt):
                    return jnp.pad(sc.astype(dt).reshape(b, s, nh),
                                   ((0, 0), (0, 0), (0, sw - nh)))

                ck = _store(ck, kq.reshape(b, s, -1))
                cv = _store(cv, vq.reshape(b, s, -1))
                ks = _store(ks, _padh(ksc, ks.dtype))
                vs = _store(vs, _padh(vsc, vs.dtype))
                new_cache = (ck, cv, ks, vs)
                # dequant fuses into the attention consumer: HBM reads stay
                # int8, the MXU sees bf16.
                ck = (ck.reshape(b, max_len, nh, hd).astype(cfg.dtype)
                      * ks[..., :nh, None].astype(cfg.dtype))
                cv = (cv.reshape(b, max_len, nh, hd).astype(cfg.dtype)
                      * vs[..., :nh, None].astype(cfg.dtype))
            else:
                ck, cv = layer_cache
                max_len = ck.shape[1]
                ck = _store(ck, k.astype(ck.dtype).reshape(b, s, -1))
                cv = _store(cv, v.astype(cv.dtype).reshape(b, s, -1))
                new_cache = (ck, cv)
                ck = ck.reshape(b, max_len, nh, hd)
                cv = cv.reshape(b, max_len, nh, hd)
            attn = dot_product_attention(
                q, ck, cv, kv_valid=kv_valid, causal=s > 1,
                q_offset=cache_index if s > 1 else None,
                impl="xla" if (s == 1 or per_row) else cfg.attention_impl)
        else:
            attn = dot_product_attention(
                q, k, v, kv_valid=kv_valid, causal=True,
                impl=cfg.attention_impl)

        attn = attn.reshape(b, s, cfg.num_heads * cfg.head_dim)
        attn = dense("o_proj", cfg.hidden_size, "heads", "embed")(attn)
        x = x + attn

        h = RMSNorm(epsilon=cfg.rms_eps, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype,
                    name="post_attention_layernorm")(x)
        gate = dense("gate_proj", cfg.intermediate_size, "embed", "mlp")(h)
        up = dense("up_proj", cfg.intermediate_size, "embed", "mlp")(h)
        down = dense("down_proj", cfg.hidden_size, "mlp", "embed")(
            nn.silu(gate) * up)
        return x + down, new_cache


class _ScannedBlock(nn.Module):
    """Adapter giving LlamaBlock a scan-friendly (carry, per-layer) signature."""

    cfg: LlamaConfig

    @nn.compact
    def __call__(self, carry, layer_cache):
        x, cos, sin, kv_valid, cache_index, write_widths = carry
        x, new_cache = LlamaBlock(self.cfg, name="layer")(
            x, layer_cache, cos, sin, kv_valid, cache_index, write_widths)
        return (x, cos, sin, kv_valid, cache_index, write_widths), new_cache


class Embedder(nn.Module):
    """Token-embedding table (resized multimodal vocab, 32330 rows —
    the reference mean-inits the 330 new rows at conversion time,
    peft_models.py:60-84; our weight converter does the same)."""

    cfg: LlamaConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        v = cfg.padded_vocab_size
        if cfg.quantization in ("int8_full", "int4"):
            table_q = self.param(
                "embedding_q",
                nn.with_logical_partitioning(nn.initializers.zeros_init(),
                                             ("vocab", "embed")),
                (v, cfg.hidden_size), jnp.int8)
            scale = self.param(
                "embedding_scale",
                nn.with_logical_partitioning(nn.initializers.ones_init(),
                                             ("vocab",)),
                (v,), jnp.float32)
            rows = jnp.take(table_q, input_ids, axis=0).astype(cfg.dtype)
            return rows * jnp.take(scale, input_ids,
                                   axis=0)[..., None].astype(cfg.dtype)
        table = self.param(
            "embedding",
            nn.with_logical_partitioning(default_init, ("vocab", "embed")),
            (v, cfg.hidden_size), cfg.param_dtype)
        return jnp.take(table, input_ids, axis=0).astype(cfg.dtype)


class LlamaModel(nn.Module):
    """Decoder trunk: N blocks + final norm (embeddings live in
    LlamaForCausalLM so callers can splice image embeddings in between)."""

    cfg: LlamaConfig

    @nn.compact
    def __call__(self, inputs_embeds, positions, kv_valid=None, cache=None,
                 cache_index=0, block_tables=None, write_widths=None,
                 tok_row=None, tok_slot=None, packed_window=0):
        """Returns (hidden_states, new_cache).  ``write_widths`` enables the
        fused ragged prefill+decode step (see LlamaBlock).  ``tok_row`` /
        ``tok_slot`` / ``packed_window`` select the PACKED fused step
        (decode_stacked.decode_layers_packed): ``inputs_embeds`` is a flat
        [P, hidden] token batch (P = slots + packed_window), ``positions``
        [P], and the returned hidden is [P, hidden] — stacked-int4 only."""
        cfg = self.cfg
        x = inputs_embeds.astype(cfg.dtype)
        cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
        packed = tok_row is not None

        use_stacked = (
            cfg.scan_layers and cfg.quantization == "int4"
            and cache is not None
            and (packed or x.shape[1] == 1 or write_widths is not None)
            and cfg.stacked_decode != "never"
            and not self.is_initializing()
            and (cfg.stacked_decode == "force"
                 or jax.default_backend() == "tpu"))
        if block_tables is not None and not use_stacked:
            raise ValueError(
                "paged KV (block_tables) requires the stacked int4 decode "
                "path (quantization='int4', seq==1, stacked_decode on)")
        if packed and not use_stacked:
            raise ValueError(
                "packed fused step (tok_row) requires the stacked int4 "
                "decode path")
        if packed:
            from seedx_tpu.models.decode_stacked import decode_layers_packed

            layer_params = nn.meta.unbox(
                self.variables["params"]["layers"]["layer"])
            x, new_cache = decode_layers_packed(
                cfg, layer_params, x, cos, sin, kv_valid, cache,
                jnp.asarray(cache_index, jnp.int32),
                tok_row=tok_row, tok_slot=tok_slot,
                write_widths=write_widths, window=packed_window,
                block_tables=block_tables,
                interpret=jax.default_backend() != "tpu")
        elif use_stacked:
            from seedx_tpu.models.decode_stacked import decode_layers_stacked

            layer_params = nn.meta.unbox(
                self.variables["params"]["layers"]["layer"])
            x, new_cache = decode_layers_stacked(
                cfg, layer_params, x, cos, sin, kv_valid, cache,
                jnp.asarray(cache_index, jnp.int32),
                block_tables=block_tables, write_widths=write_widths,
                interpret=jax.default_backend() != "tpu")
        elif cfg.scan_layers:
            block = _ScannedBlock
            # remat is a training-memory tool; the int8 path is serving-only
            # (and int8 leaves break remat's jvp tracing inside scan).
            if cfg.remat and cfg.quantization == "none":
                block = nn.remat(block, prevent_cse=False)
            carry = (x, cos, sin, kv_valid,
                     jnp.asarray(cache_index, jnp.int32), write_widths)
            carry, new_cache = nn.scan(
                block,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=0,
                out_axes=0,
                length=cfg.num_layers,
                metadata_params={nn.PARTITION_NAME: "layers"},
            )(cfg, name="layers")(carry, cache)
            x = carry[0]
        else:
            new_layers = []
            for i in range(cfg.num_layers):
                layer_cache = None if cache is None else jax.tree.map(
                    lambda c: c[i], cache)
                x, nc = LlamaBlock(cfg, name=f"layer_{i}")(
                    x, layer_cache, cos, sin, kv_valid, cache_index,
                    write_widths)
                new_layers.append(nc)
            new_cache = None if cache is None else jax.tree.map(
                lambda *cs: jnp.stack(cs), *new_layers)

        x = RMSNorm(epsilon=cfg.rms_eps, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, name="norm")(x)
        return x, new_cache


class LlamaForCausalLM(nn.Module):
    """Trunk + LM head.  ``__call__`` mirrors the reference dual-input
    contract: callers embed ids themselves (via ``.embed``), splice image
    embeddings in, and pass the result here."""

    cfg: LlamaConfig

    def setup(self):
        self.embed_tokens = Embedder(self.cfg)
        self.model = LlamaModel(self.cfg)
        # LoRADense(rank=0) == PDense + the int8 path (param names identical).
        self.lm_head = LoRADense(
            self.cfg.padded_vocab_size, kernel_axes=("embed", "vocab"),
            use_bias=False,
            quantize="int8" if self.cfg.quantization in ("int8_full", "int4")
            else "none",
            dtype=self.cfg.dtype, param_dtype=self.cfg.param_dtype)

    def embed(self, input_ids):
        return self.embed_tokens(input_ids)

    def init_all(self, input_ids, positions, kv_valid=None):
        """Init helper touching every submodule (use as init method)."""
        return self(self.embed(input_ids), positions, kv_valid)

    def __call__(self, inputs_embeds, positions, kv_valid=None, cache=None,
                 cache_index=0, block_tables=None, write_widths=None,
                 tok_row=None, tok_slot=None, packed_window=0):
        """Returns (logits, last_hidden_state, new_cache).

        block_tables: [batch, n_tiles] int32 — the cache is a shared PAGED
        pool ([L, pool_rows, f] leaves) and row b's logical KV tile j lives
        at pool tile ``block_tables[b, j]``; requires the stacked int4
        decode path + ragged attention (paged continuous serving).
        write_widths: [batch] int32 — fused ragged prefill+decode step
        (see LlamaBlock).  tok_row/tok_slot/packed_window: the PACKED
        fused step over a flat [P, hidden] token batch (see LlamaModel)."""
        hidden, new_cache = self.model(
            inputs_embeds, positions, kv_valid=kv_valid, cache=cache,
            cache_index=cache_index, block_tables=block_tables,
            write_widths=write_widths, tok_row=tok_row, tok_slot=tok_slot,
            packed_window=packed_window)
        logits = self.lm_head(hidden)
        if self.cfg.padded_vocab_size != self.cfg.vocab_size:
            # vocab-padded TP layout: pad columns can never win argmax or
            # contribute to the softmax
            logits = jnp.where(
                jnp.arange(logits.shape[-1]) < self.cfg.vocab_size,
                logits, jnp.asarray(-1e9, logits.dtype))
        return logits, hidden, new_cache


def causal_lm_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Shifted cross-entropy ignoring IGNORE_INDEX
    (reference: modeling_llama_xformer.py:708-729)."""
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    token_ll = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    total = jnp.sum(jnp.where(valid, -token_ll, 0.0))
    count = jnp.maximum(jnp.sum(valid), 1)
    return total / count


class LlamaForSequenceClassification(nn.Module):
    """Sequence classification head over the trunk
    (reference: modeling_llama_xformer.py:804-919): score the LAST non-pad
    token's hidden state, like the HF semantics."""

    cfg: LlamaConfig
    num_labels: int = 2

    def setup(self):
        self.embed_tokens = Embedder(self.cfg)
        self.model = LlamaModel(self.cfg)
        self.score = PDense(self.num_labels, kernel_axes=("embed", None),
                            use_bias=False, dtype=self.cfg.dtype,
                            param_dtype=self.cfg.param_dtype)

    def __call__(self, input_ids, attention_mask=None):
        b, s = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), bool)
        positions = jnp.maximum(
            jnp.cumsum(attention_mask.astype(jnp.int32), axis=-1) - 1, 0)
        embeds = self.embed_tokens(input_ids)
        hidden, _ = self.model(embeds, positions,
                               kv_valid=attention_mask.astype(bool))
        logits = self.score(hidden)
        last = jnp.sum(attention_mask.astype(jnp.int32), axis=-1) - 1
        return jnp.take_along_axis(
            logits, last[:, None, None].astype(jnp.int32), axis=1)[:, 0]
