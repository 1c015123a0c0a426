"""SFT trainer: one jitted, donated train step over the FSDP mesh.

Replaces the reference's Accelerate/DeepSpeed stack
(reference: src/train/train_seed_x_sft.py:124-343):
  * ZeRO-3 param/grad/optimizer sharding  -> NamedSharding over the ``fsdp``
    mesh axis; XLA schedules the allgather/reduce-scatter pipeline,
  * fp16 loss scaling                     -> bf16 end-to-end, no scaler,
  * ``accelerator.backward`` + clip + step -> one ``value_and_grad`` over the
    *trainable* subtree only (frozen 13B never materialises grads/opt state),
  * cross-rank metric all_gather (src/train/dist_utils.py:5-9) -> metrics are
    already global under SPMD jit.

Hyperparameter defaults follow scripts/train_seed_x_sft_comp_gen.sh:19-35
(lr 1e-4, wd 0.05, betas (0.9, 0.98), eps 1e-6, cosine min-lr 0.05,
warmup 500, 20k steps, grad clip 1.0).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from seedx_tpu.train.partition import (SEED_X_TRAINABLE_PATTERNS, merge_params,
                                       path_labels, split_params)
from seedx_tpu.train.schedule import get_schedule


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.05
    adam_beta1: float = 0.9
    adam_beta2: float = 0.98
    adam_epsilon: float = 1e-6
    max_grad_norm: float = 1.0
    lr_scheduler_type: str = "cosine"
    warmup_steps: int = 500
    max_steps: int = 20000
    min_lr_ratio: float = 0.05
    gradient_accumulation_steps: int = 1
    trainable_patterns: Tuple[str, ...] = SEED_X_TRAINABLE_PATTERNS


class TrainState(struct.PyTreeNode):
    """Donated training state: ONLY the trainable subtree + optimizer state.

    The frozen 13B subtree is passed alongside (never donated, never
    checkpointed, no optimizer state) — the structural win over ZeRO-3,
    which shards but still materialises everything per step."""

    step: jnp.ndarray
    trainable: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def params(self, frozen):
        return merge_params(self.trainable, frozen)


def make_optimizer(cfg: TrainConfig) -> Tuple[optax.GradientTransformation,
                                              Callable]:
    schedule = get_schedule(cfg.lr_scheduler_type, cfg.learning_rate,
                            cfg.warmup_steps, cfg.max_steps, cfg.min_lr_ratio)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(schedule, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                    eps=cfg.adam_epsilon, weight_decay=cfg.weight_decay),
    )
    return tx, schedule


def create_train_state(params: Any, cfg: TrainConfig):
    """Split params into trainable/frozen; init optimizer state only over the
    trainable subtree.  Returns ``(state, frozen)``.  The trainable leaves
    are copied so the caller's tree survives step donation."""
    labels = path_labels(params, cfg.trainable_patterns)
    trainable, frozen = split_params(params, labels)
    trainable = jax.tree.map(jnp.array, trainable)  # own the donated buffers
    tx, _ = make_optimizer(cfg)
    opt_state = tx.init(trainable)
    state = TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                       opt_state=opt_state, tx=tx)
    return state, frozen


def make_train_step(model, train_cfg: TrainConfig):
    """Returns a jitted ``(state, batch, rng) -> (state, metrics)``.

    ``batch`` keys follow the reference collator contract
    (src/data/any_res.py:217-250): input_ids, attention_mask, labels,
    image_embeds, embeds_gen_mask, embeds_cmp_mask, ids_gen_mask,
    ids_cmp_mask, patch_positions.
    """
    _, schedule = make_optimizer(train_cfg)

    def loss_fn(trainable, frozen, batch, rng):
        params = merge_params(trainable, frozen)
        out = model.apply(
            {"params": params},
            batch["input_ids"], batch["attention_mask"], batch["labels"],
            batch.get("image_embeds"), batch.get("embeds_gen_mask"),
            batch.get("embeds_cmp_mask"), batch["ids_gen_mask"],
            batch["ids_cmp_mask"], batch.get("patch_positions"),
            rngs={"dropout": rng})
        return out["total_loss"], out

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, frozen: Any,
                   batch: Dict[str, jnp.ndarray], rng: jnp.ndarray):
        accum = train_cfg.gradient_accumulation_steps
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        if accum > 1:
            # batch leading dim = accum micro-batches; lax.scan accumulates.
            def micro(carry, mb):
                grads_acc, loss_acc, rng = carry
                rng, sub = jax.random.split(rng)
                (loss, out), grads = grad_fn(state.trainable, frozen,
                                             mb, sub)
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                loss_acc = jax.tree.map(jnp.add, loss_acc,
                                        {k: v for k, v in out.items()})
                return (grads_acc, loss_acc, rng), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.trainable)
            zero_loss = {k: jnp.zeros((), jnp.float32)
                         for k in ("total_loss", "lm_loss", "rec_loss")}
            (grads, losses, _), _ = jax.lax.scan(
                micro, (zero_grads, zero_loss, rng), batch)
            grads = jax.tree.map(lambda g: g / accum, grads)
            out = jax.tree.map(lambda x: x / accum, losses)
        else:
            (_, out), grads = grad_fn(state.trainable, frozen, batch, rng)

        updates, opt_state = state.tx.update(grads, state.opt_state,
                                             state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        new_state = state.replace(step=state.step + 1, trainable=trainable,
                                  opt_state=opt_state)
        metrics = {
            "total_loss": out["total_loss"],
            "lm_loss": out["lm_loss"],
            "rec_loss": out["rec_loss"],
            "grad_norm": optax.global_norm(grads),
            "lr": schedule(state.step),
        }
        return new_state, metrics

    return train_step
