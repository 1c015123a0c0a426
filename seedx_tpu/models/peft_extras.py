"""PEFT tuners beyond LoRA — fork-parity extras.

The reference vendors a patched PEFT fork (proj/peft/src/peft/tuners/)
whose SEED-X configs only ever use LoRA (configs/clm_models/
llm_seed_x_lora.yaml:6-25).  For fork parity the TPU framework carries the
two tuners that translate cleanly to the SPMD pytree+optax-mask design:

  * IA3 (reference ia3.py): ones-init elementwise rescaling vectors on
    k_proj/v_proj outputs and the down_proj input — built into
    ``models.layers.LoRADense(ia3=...)`` and switched on with
    ``LlamaConfig(ia3=True)``; train with
    ``trainable_patterns=(r".*ia3_scale$",)``.
  * Prompt tuning (reference prompt_tuning.py): learned virtual-token
    embeddings prepended to the input embedding stream — ``SoftPrompt``
    below plus ``apply_soft_prompt`` which also fixes up attention mask
    and labels.  Works with the LLaMA dual-input contract (models/
    llama.py: ids or inputs_embeds) so no backbone change is needed.

Deliberately NOT carried (documented descope, PARITY.md §2b row 12):
AdaLoRA (adalora.py — an SVD-parameterised training-schedule feature with
rank reallocation; no SEED-X flow uses it) and prefix/p-tuning
(prefix_tuning.py — learned per-layer past-KV, which would thread a
second KV stream through the cache machinery for a tuner nothing uses).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn


class SoftPrompt(nn.Module):
    """Learned virtual-token embeddings (prompt tuning).

    reference: proj/peft/src/peft/tuners/prompt_tuning.py — an
    nn.Embedding over ``num_virtual_tokens`` ids, always selected in
    order; here that is simply a [n, hidden] parameter broadcast over the
    batch."""

    num_virtual_tokens: int
    hidden_size: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch: int) -> jnp.ndarray:
        emb = self.param(
            "embedding",
            nn.with_logical_partitioning(
                nn.initializers.normal(stddev=0.02), (None, "embed")),
            (self.num_virtual_tokens, self.hidden_size), self.param_dtype)
        return jnp.broadcast_to(
            emb[None], (batch, self.num_virtual_tokens, self.hidden_size))


def apply_soft_prompt(
    prompt_embeds: jnp.ndarray,
    inputs_embeds: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    labels: Optional[jnp.ndarray] = None,
    ignore_index: int = -100,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """Prepend soft-prompt embeddings to an embedding stream.

    Mirrors the reference PeftModelForCausalLM.forward prompt-tuning path
    (proj/peft/src/peft/peft_model.py): virtual tokens are real attended
    positions (mask=1) that never contribute to the LM loss
    (labels=ignore_index).  Returns (embeds, mask, labels) with static
    shapes [B, n+S, ...] — jit-friendly, no dynamic lengths."""
    b = inputs_embeds.shape[0]
    n = prompt_embeds.shape[1]
    embeds = jnp.concatenate(
        [prompt_embeds.astype(inputs_embeds.dtype), inputs_embeds], axis=1)
    mask_out = None
    if attention_mask is not None:
        mask_out = jnp.concatenate(
            [jnp.ones((b, n), attention_mask.dtype), attention_mask], axis=1)
    labels_out = None
    if labels is not None:
        labels_out = jnp.concatenate(
            [jnp.full((b, n), ignore_index, labels.dtype), labels], axis=1)
    return embeds, mask_out, labels_out


# Trainable-pattern presets for train.partition.path_labels
IA3_TRAINABLE_PATTERNS: Tuple[str, ...] = (r".*ia3_scale$",)
PROMPT_TRAINABLE_PATTERNS: Tuple[str, ...] = (r".*soft_prompt.*",)
