"""Trainable/frozen parameter partitioning.

The reference freezes the 13B LLaMA and the ViT and trains: LoRA factors on
all 7 projections, the layernorms (PEFT ``modules_to_save``), the resized
embeddings + lm head, the agent's input/output resamplers and patch-pos
embedding (reference: configs/clm_models/llm_seed_x_lora.yaml:6-25,
src/models/mllm/peft_models.py:85-92, src/train/train_seed_x_sft.py:189-197).

Under SPMD this is just a label tree over parameter paths: gradients are only
computed for the trainable subtree (the frozen 13B weights never materialise
gradients or optimizer state), which is strictly cheaper than the reference's
requires_grad approach under ZeRO.
"""

from __future__ import annotations

import re
from typing import Any, Sequence, Tuple

import jax
from flax import traverse_util

# Default trainable path patterns for SEED-X SFT (matched against the
# '/'-joined parameter path).
SEED_X_TRAINABLE_PATTERNS: Tuple[str, ...] = (
    r".*lora_[ab]$",                     # LoRA factors
    r".*input_layernorm.*",              # modules_to_save layernorms
    r".*post_attention_layernorm.*",
    r".*model/norm.*",
    r".*embed_tokens.*",                 # resized embeddings re-enabled
    r".*lm_head.*",
    r".*input_resampler.*",              # agent resamplers train fully
    r".*output_resampler.*",
    r".*patch_pos_embed.*",
)


def path_labels(params: Any, trainable_patterns: Sequence[str]
                = SEED_X_TRAINABLE_PATTERNS) -> Any:
    """Label tree: 'trainable' where the path matches any pattern, else
    'frozen'."""
    regexes = [re.compile(p) for p in trainable_patterns]
    flat = traverse_util.flatten_dict(params, sep="/")
    labels = {
        k: "trainable" if any(r.match(k) for r in regexes) else "frozen"
        for k in flat
    }
    return traverse_util.unflatten_dict(labels, sep="/")


def split_params(params: Any, labels: Any) -> Tuple[Any, Any]:
    """-> (trainable_tree, frozen_tree), same structure, None where absent."""
    flat_p = traverse_util.flatten_dict(params, sep="/")
    flat_l = traverse_util.flatten_dict(labels, sep="/")
    train = {k: v for k, v in flat_p.items() if flat_l[k] == "trainable"}
    frozen = {k: v for k, v in flat_p.items() if flat_l[k] == "frozen"}
    return (traverse_util.unflatten_dict(train, sep="/"),
            traverse_util.unflatten_dict(frozen, sep="/"))


def merge_params(trainable: Any, frozen: Any) -> Any:
    flat = dict(traverse_util.flatten_dict(frozen, sep="/"))
    flat.update(traverse_util.flatten_dict(trainable, sep="/"))
    return traverse_util.unflatten_dict(flat, sep="/")


def count_params(tree: Any) -> int:
    return sum(x.size for x in jax.tree.leaves(tree))
