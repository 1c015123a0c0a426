"""LR schedules.

``cosine_with_min_lr`` reproduces the reference's custom cosine schedule
exactly (reference: src/train/schedular.py:18-30):
  warmup: linear 0 -> lr over ``warmup_steps``,
  then:   lr * 0.5 * ((1+r) + (1-r) * cos(pi * progress)), floor = r * lr.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def cosine_with_min_lr(learning_rate: float, warmup_steps: int,
                       total_steps: int, min_lr_ratio: float = 0.0,
                       num_cycles: float = 0.5):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / jnp.maximum(
            1.0, total_steps - warmup_steps)
        cos = 0.5 * ((1.0 + min_lr_ratio) + (1.0 - min_lr_ratio)
                     * jnp.cos(jnp.pi * num_cycles * 2.0 * progress))
        factor = jnp.where(step < warmup_steps, warm, jnp.maximum(0.0, cos))
        return learning_rate * factor

    return schedule


def get_schedule(name: str, learning_rate: float, warmup_steps: int = 0,
                 total_steps: int = 0, min_lr_ratio: float = 0.0):
    """Registry mirroring the reference's get_scheduler
    (src/train/schedular.py:83-128)."""
    if name == "cosine":
        return cosine_with_min_lr(learning_rate, warmup_steps, total_steps,
                                  min_lr_ratio)
    if name == "constant":
        return optax.constant_schedule(learning_rate)
    if name == "constant_with_warmup":
        return optax.linear_schedule(0.0, learning_rate, warmup_steps)
    if name == "linear":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, warmup_steps),
             optax.linear_schedule(learning_rate, 0.0,
                                   max(1, total_steps - warmup_steps))],
            [warmup_steps])
    raise ValueError(f"unknown schedule {name!r}")
