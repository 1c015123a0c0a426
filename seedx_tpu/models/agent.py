"""ContinuousLVLM — the SEED-X multimodal agent.

Capability parity with the reference agent (reference: src/models/mllm/seed_x.py):
input images are resampled into the LLM token-embedding stream at the
``ids_cmp_mask`` positions; image outputs are regressed from the final hidden
states at the ``ids_gen_mask`` positions through an output resampler, trained
with MSE against (optionally 4x-pooled) ViT features; total loss =
``lm_loss_scale * lm + rec_loss_scale * rec`` (seed_x.py:48-128,
configs/clm_models/agent_seed_x.yaml).

TPU-first reformulation (static shapes, no boolean fancy-indexing):
  * each batch carries a *fixed* number of image slots ``N`` (the collator
    pads); ``embeds_cmp_mask``/``embeds_gen_mask`` [N] mark real slots,
  * the torch ``tensor[mask] = rows`` scatter becomes a rank-compaction:
    ``rank = cumsum(mask) - 1`` maps every masked token position to its row in
    the compacted image-embedding matrix, then one gather + ``jnp.where``,
  * the reference's fake-embedding dummy paths (seed_x.py:71-89,119-124) —
    a ZeRO/DDP graph-uniformity workaround — vanish: SPMD jit traces one
    program; empty batches just contribute masked-out zeros.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from seedx_tpu.models.llama import (LlamaConfig, LlamaForCausalLM,
                                    causal_lm_loss)
from seedx_tpu.models.resampler import Resampler
from seedx_tpu.models.vit import vit_downsample


@dataclasses.dataclass(frozen=True)
class AgentConfig:
    """Agent hyperparameters (configs/clm_models/agent_seed_x.yaml)."""

    llm: LlamaConfig
    num_img_in_tokens: int = 64   # input resampler queries (grid 8)
    num_img_out_tokens: int = 64  # output resampler queries (grid 8)
    vit_dim: int = 4096           # ViT output dim (qwen_vitg_448.yaml:7)
    resampler_heads: int = 32
    lm_loss_scale: float = 1.0
    rec_loss_scale: float = 6.0
    add_patch_pos: bool = True
    vit_down: bool = True         # avg-pool ViT 256 -> 64 tokens for targets
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32


def seed_x_agent(llm: LlamaConfig, **overrides) -> AgentConfig:
    return AgentConfig(llm=llm, **overrides)


def _compact_rows(rows: jnp.ndarray, slot_mask: jnp.ndarray) -> jnp.ndarray:
    """Pack rows of valid slots to the front, preserving order.

    rows: [N, T, D]; slot_mask: [N] bool.  Output [N, T, D] where output[j]
    is the j-th valid slot (invalid tail is zeros).  Static-shape equivalent
    of ``rows[slot_mask]``.
    """
    n = rows.shape[0]
    rank = jnp.cumsum(slot_mask) - 1                     # [N]
    target = jnp.where(slot_mask, rank, n)               # invalid -> OOB
    out = jnp.zeros_like(rows)
    return out.at[target].set(rows, mode="drop")


def _scatter_to_positions(base: jnp.ndarray, token_mask: jnp.ndarray,
                          compact_rows: jnp.ndarray) -> jnp.ndarray:
    """Place ``compact_rows`` (flattened [M, D]) at the True positions of
    ``token_mask`` (scanned in row-major order) inside ``base`` [B, S, D]."""
    b, s, d = base.shape
    flat_mask = token_mask.reshape(-1)
    rank = jnp.cumsum(flat_mask) - 1                     # [B*S]
    picked = jnp.take(compact_rows, jnp.clip(rank, 0, compact_rows.shape[0] - 1),
                      axis=0)
    out = jnp.where(flat_mask[:, None], picked.astype(base.dtype),
                    base.reshape(-1, d))
    return out.reshape(b, s, d)


def _gather_from_positions(hidden: jnp.ndarray, token_mask: jnp.ndarray,
                           num_slots: int, tokens_per_slot: int) -> jnp.ndarray:
    """Inverse of ``_scatter_to_positions``: collect hidden rows at the True
    positions into [num_slots, tokens_per_slot, D] (row-major order)."""
    b, s, d = hidden.shape
    flat = hidden.reshape(-1, d)
    flat_mask = token_mask.reshape(-1)
    rank = jnp.cumsum(flat_mask) - 1
    target = jnp.where(flat_mask, rank, num_slots * tokens_per_slot)
    out = jnp.zeros((num_slots * tokens_per_slot, d), hidden.dtype)
    out = out.at[target].set(flat, mode="drop")
    return out.reshape(num_slots, tokens_per_slot, d)


class ContinuousLVLM(nn.Module):
    cfg: AgentConfig

    def setup(self):
        cfg = self.cfg
        self.llm = LlamaForCausalLM(cfg.llm)
        self.input_resampler = Resampler(
            grid_size=int(cfg.num_img_in_tokens ** 0.5),
            embed_dim=cfg.llm.hidden_size,
            num_heads=cfg.resampler_heads,
            kv_dim=cfg.vit_dim,
            dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        self.output_resampler = Resampler(
            grid_size=int(cfg.num_img_out_tokens ** 0.5),
            embed_dim=cfg.vit_dim,
            num_heads=cfg.resampler_heads,
            kv_dim=cfg.llm.hidden_size,
            dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        if cfg.add_patch_pos:
            # 4-corner tile-position embedding (reference: seed_x.py:43-45).
            self.patch_pos_embed = self.param(
                "patch_pos_embed",
                nn.with_logical_partitioning(
                    nn.initializers.normal(stddev=cfg.llm.hidden_size ** -0.5),
                    (None, "embed")),
                (4, cfg.llm.hidden_size), cfg.param_dtype)

    def _embed_images(self, image_embeds: jnp.ndarray,
                      patch_positions: Optional[jnp.ndarray]) -> jnp.ndarray:
        """ViT features [N, T, vit_dim] -> LLM-space tokens [N, n_in, hidden]."""
        cfg = self.cfg
        x = self.input_resampler(image_embeds)
        if cfg.add_patch_pos and patch_positions is not None:
            coords = jnp.concatenate(
                [patch_positions, 1.0 - patch_positions], axis=-1) / 2.0
            rel = jnp.dot(coords.astype(x.dtype),
                          self.patch_pos_embed.astype(x.dtype))
            x = x + rel[:, None, :]
        return x

    # ---- generation-facing methods (used via .apply(..., method=...)) ----

    def embed_with_images(self, input_ids, image_embeds=None,
                          ids_cmp_mask=None, embeds_cmp_mask=None,
                          patch_positions=None):
        """Token embeddings with resampled image embeddings spliced in at the
        ``ids_cmp_mask`` positions (reference: seed_x.py:158-173)."""
        input_embeds = self.llm.embed(input_ids)
        if image_embeds is not None:
            img_lm = self._embed_images(image_embeds, patch_positions)
            if embeds_cmp_mask is not None:
                img_lm = _compact_rows(img_lm, embeds_cmp_mask)
            flat_rows = img_lm.reshape(-1, self.cfg.llm.hidden_size)
            input_embeds = _scatter_to_positions(
                input_embeds, ids_cmp_mask, flat_rows)
        return input_embeds

    def embed_ids(self, input_ids):
        return self.llm.embed(input_ids)

    def llm_step(self, inputs_embeds, positions, kv_valid=None, cache=None,
                 cache_index=0, block_tables=None, write_widths=None,
                 tok_row=None, tok_slot=None, packed_window=0):
        """One llm forward (prefill or decode step); returns
        (logits, hidden, new_cache).  ``block_tables`` selects the paged-KV
        decode path; ``write_widths`` the fused ragged prefill+decode step;
        ``tok_row``/``tok_slot``/``packed_window`` its PACKED variant over
        a flat [P, hidden] token batch (see LlamaForCausalLM.__call__)."""
        return self.llm(inputs_embeds, positions, kv_valid, cache,
                        cache_index, block_tables, write_widths,
                        tok_row, tok_slot, packed_window)

    def decode_image_feats(self, hidden_states):
        """Output-resampler pass over generated hidden spans
        [num_imgs, num_img_out_tokens, llm_hidden] -> [num_imgs, n, vit_dim]
        (reference: seed_x.py:204-210)."""
        return self.output_resampler(hidden_states)

    def init_all(self, input_ids, attention_mask, labels, image_embeds,
                 embeds_gen_mask, embeds_cmp_mask, ids_gen_mask, ids_cmp_mask,
                 patch_positions=None):
        """Init helper touching every submodule."""
        out = self(input_ids, attention_mask, labels, image_embeds,
                   embeds_gen_mask, embeds_cmp_mask, ids_gen_mask,
                   ids_cmp_mask, patch_positions)
        if image_embeds is not None:
            _ = self.decode_image_feats(
                jnp.zeros((1, self.cfg.num_img_out_tokens,
                           self.cfg.llm.hidden_size), self.cfg.dtype))
        return out

    def __call__(
        self,
        input_ids: jnp.ndarray,        # [B, S] int32
        attention_mask: jnp.ndarray,   # [B, S] bool/int (right-padded)
        labels: jnp.ndarray,           # [B, S] int32, IGNORE_INDEX masked
        image_embeds: Optional[jnp.ndarray],   # [N, T, vit_dim]
        embeds_gen_mask: Optional[jnp.ndarray],  # [N] bool
        embeds_cmp_mask: Optional[jnp.ndarray],  # [N] bool
        ids_gen_mask: jnp.ndarray,     # [B, S] bool
        ids_cmp_mask: jnp.ndarray,     # [B, S] bool
        patch_positions: Optional[jnp.ndarray] = None,  # [N, 2]
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        rec_loss = jnp.float32(0.0)
        # --- comprehension splice (reference seed_x.py:56-86) ---
        input_embeds = self.embed_with_images(
            input_ids, image_embeds, ids_cmp_mask, embeds_cmp_mask,
            patch_positions)
        if image_embeds is not None:
            n_slots = image_embeds.shape[0]

        kv_valid = attention_mask.astype(bool)
        logits, hidden, _ = self.llm(input_embeds, _positions(attention_mask),
                                     kv_valid)
        lm_loss = causal_lm_loss(logits, labels)

        if image_embeds is not None:
            # --- generation regression (reference seed_x.py:100-117) ---
            target = image_embeds
            if cfg.vit_down:
                target = vit_downsample(target)
            if target.shape[1] != cfg.num_img_out_tokens:
                raise ValueError(
                    f"reconstruction target has {target.shape[1]} tokens but "
                    f"num_img_out_tokens={cfg.num_img_out_tokens}; with "
                    f"vit_down the ViT must emit 4*num_img_out_tokens tokens "
                    f"(reference: seed_x.py:101-111)")
            target_compact = _compact_rows(target, embeds_gen_mask)

            gen_hidden = _gather_from_positions(
                hidden, ids_gen_mask, n_slots, cfg.num_img_out_tokens)
            recon = self.output_resampler(gen_hidden)

            num_gen = jnp.sum(embeds_gen_mask.astype(jnp.int32))
            slot_valid = (jnp.arange(n_slots) < num_gen)[:, None, None]
            sq = (recon.astype(jnp.float32)
                  - jax.lax.stop_gradient(target_compact.astype(jnp.float32))) ** 2
            denom = jnp.maximum(num_gen, 1) * target.shape[1] * target.shape[2]
            rec_loss = jnp.sum(jnp.where(slot_valid, sq, 0.0)) / denom

        total = cfg.lm_loss_scale * lm_loss + cfg.rec_loss_scale * rec_loss
        return {"total_loss": total, "lm_loss": lm_loss, "rec_loss": rec_loss}


def _positions(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """Position ids from a (left- or right-) padded attention mask."""
    mask = attention_mask.astype(jnp.int32)
    return jnp.maximum(jnp.cumsum(mask, axis=-1) - 1, 0)
