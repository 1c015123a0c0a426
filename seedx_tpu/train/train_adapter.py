"""De-tokenizer adapter training: diffusion MSE over ViT conditioning.

The reference ships the adapter's training *forward* (diffusion noise-pred
MSE, reference: src/models/detokenizer/adapter_modules.py:39-52; trainable
sets :21-33) and releases two-stage detokenizer checkpoints
(configs/sdxl_adapter/*.yaml), though its training driver is not in the repo.
This module provides the full TPU-native stage:

  batch images -> frozen ViT features (+vit_down) + frozen VAE latents ->
  sample sigma/noise -> UNet eps prediction conditioned via the perceiver
  resampler -> MSE -> update resampler + UNet to_k/to_v (or full FT).

Uses the same Euler sigma schedule tables as inference; sharded/donated like
the SFT step.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from seedx_tpu.models.adapter import ADAPTER_TRAINABLE_PATTERNS
from seedx_tpu.models.sdxl.scheduler import EulerScheduleConfig
from seedx_tpu.train.partition import merge_params, path_labels, split_params
from seedx_tpu.train.schedule import get_schedule


@dataclasses.dataclass(frozen=True)
class AdapterTrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    max_grad_norm: float = 1.0
    warmup_steps: int = 500
    max_steps: int = 20000
    min_lr_ratio: float = 0.05
    full_ft: bool = False
    trainable_patterns: Tuple[str, ...] = ADAPTER_TRAINABLE_PATTERNS


def make_sigma_tables(cfg: EulerScheduleConfig = EulerScheduleConfig()):
    """Per-train-timestep sigma table for noise sampling."""
    betas = np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5,
                        cfg.num_train_timesteps, dtype=np.float64) ** 2
    ac = np.cumprod(1.0 - betas)
    sigmas = np.sqrt((1.0 - ac) / ac).astype(np.float32)
    return jnp.asarray(sigmas)


def make_adapter_train_step(unet, resampler, train_cfg: AdapterTrainConfig,
                            time_ids: jnp.ndarray):
    """(state, frozen, batch, rng) -> (state, metrics).

    batch: {"latents": [B, h, w, 4] scaled VAE latents of the target image,
            "image_embeds": [B, T, 4096] (pooled) ViT features}.
    """
    schedule = get_schedule("cosine", train_cfg.learning_rate,
                            train_cfg.warmup_steps, train_cfg.max_steps,
                            train_cfg.min_lr_ratio)
    tx = optax.chain(
        optax.clip_by_global_norm(train_cfg.max_grad_norm),
        optax.adamw(schedule, weight_decay=train_cfg.weight_decay),
    )
    sigmas = make_sigma_tables()
    n_train = sigmas.shape[0]

    def loss_fn(trainable, frozen, batch, rng):
        params = merge_params(trainable, frozen)
        t_rng, n_rng = jax.random.split(rng)
        b = batch["latents"].shape[0]
        t = jax.random.randint(t_rng, (b,), 0, n_train)
        sigma = sigmas[t][:, None, None, None]
        noise = jax.random.normal(n_rng, batch["latents"].shape,
                                  batch["latents"].dtype)
        noisy = batch["latents"] + noise * sigma
        # Euler/K-diffusion input scaling, as at inference
        scaled = noisy / jnp.sqrt(sigma ** 2 + 1.0)

        prompt, pooled = resampler.apply({"params": params["resampler"]},
                                         batch["image_embeds"])
        eps = unet.apply({"params": params["unet"]}, scaled,
                         t.astype(jnp.float32), prompt, pooled,
                         jnp.broadcast_to(time_ids, (b, 6)))
        loss = jnp.mean((eps.astype(jnp.float32)
                         - noise.astype(jnp.float32)) ** 2)
        return loss

    def init_state(unet_params: Any, resampler_params: Any):
        params = {"unet": unet_params, "resampler": resampler_params}
        labels = path_labels(params, train_cfg.trainable_patterns
                             if not train_cfg.full_ft
                             else (r".*",))
        trainable, frozen = split_params(params, labels)
        trainable = jax.tree.map(jnp.array, trainable)
        opt_state = tx.init(trainable)
        return {"step": jnp.zeros((), jnp.int32), "trainable": trainable,
                "opt_state": opt_state}, frozen

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, frozen, batch: Dict[str, jnp.ndarray],
                   rng: jnp.ndarray):
        loss, grads = jax.value_and_grad(loss_fn)(state["trainable"], frozen,
                                                  batch, rng)
        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["trainable"])
        trainable = optax.apply_updates(state["trainable"], updates)
        new_state = {"step": state["step"] + 1, "trainable": trainable,
                     "opt_state": opt_state}
        return new_state, {"total_loss": loss,
                           "grad_norm": optax.global_norm(grads),
                           "lr": schedule(state["step"])}

    return init_state, train_step
