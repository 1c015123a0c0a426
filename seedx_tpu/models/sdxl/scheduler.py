"""Euler discrete scheduler (the SDXL default sampler).

Functional, jit-friendly equivalent of diffusers' EulerDiscreteScheduler as
used by the reference (reference: src/inference/eval_text2img_seed_x_i.py:60,
denoise loop src/models/detokenizer/pipeline_stable_diffusion_xl_t2i_edit.py:
900-963).  SDXL config: 1000 train steps, scaled_linear betas
0.00085 -> 0.012, epsilon prediction, "leading" timestep spacing with
steps_offset 1.

Everything is precomputed into arrays; the denoise loop is a ``lax.scan``
over step indices (the reference's per-step ``xm.mark_step()`` at
pipeline...py:962 confirms the loop body is XLA-friendly).
"""

from __future__ import annotations

import dataclasses
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class EulerScheduleConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    steps_offset: int = 1
    timestep_spacing: str = "leading"
    prediction_type: str = "epsilon"


@dataclasses.dataclass(frozen=True)
class EulerSchedule:
    """Precomputed tables for a fixed number of inference steps."""

    timesteps: np.ndarray      # [n] descending float
    sigmas: np.ndarray         # [n + 1] (last entry 0.0)
    init_noise_sigma: float

    @property
    def num_steps(self) -> int:
        return len(self.timesteps)


def make_schedule(num_inference_steps: int,
                  cfg: EulerScheduleConfig = EulerScheduleConfig()
                  ) -> EulerSchedule:
    n_train = cfg.num_train_timesteps
    if cfg.beta_schedule == "scaled_linear":
        betas = np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5,
                            n_train, dtype=np.float64) ** 2
    elif cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end, n_train,
                            dtype=np.float64)
    else:
        raise NotImplementedError(cfg.beta_schedule)
    alphas_cumprod = np.cumprod(1.0 - betas)
    sigmas_full = np.sqrt((1.0 - alphas_cumprod) / alphas_cumprod)

    if cfg.timestep_spacing == "leading":
        step_ratio = n_train // num_inference_steps
        timesteps = (np.arange(num_inference_steps) * step_ratio).round()
        timesteps = timesteps[::-1].astype(np.float64) + cfg.steps_offset
    elif cfg.timestep_spacing == "trailing":
        step_ratio = n_train / num_inference_steps
        timesteps = np.arange(n_train, 0, -step_ratio).round() - 1
        timesteps = timesteps.astype(np.float64)
    else:  # linspace
        timesteps = np.linspace(0, n_train - 1, num_inference_steps,
                                dtype=np.float64)[::-1]

    sigmas = np.interp(timesteps, np.arange(n_train), sigmas_full)
    sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)

    if cfg.timestep_spacing in ("linspace", "trailing"):
        init_noise_sigma = float(sigmas.max())
    else:
        init_noise_sigma = float((sigmas.max() ** 2 + 1) ** 0.5)

    return EulerSchedule(timesteps=timesteps.astype(np.float32),
                         sigmas=sigmas, init_noise_sigma=init_noise_sigma)


def scale_model_input(sample: jnp.ndarray, sigma) -> jnp.ndarray:
    """x / sqrt(sigma^2 + 1) (diffusers EulerDiscrete.scale_model_input)."""
    return sample / jnp.sqrt(sigma ** 2 + 1.0)


def euler_step(sample: jnp.ndarray, eps: jnp.ndarray, sigma,
               sigma_next) -> jnp.ndarray:
    """One Euler step, epsilon prediction, no churn.

    x0 = x - sigma * eps; d = (x - x0)/sigma = eps; x' = x + d * (s' - s).
    """
    dtype = sample.dtype
    sample = sample.astype(jnp.float32)
    eps = eps.astype(jnp.float32)
    return (sample + eps * (sigma_next - sigma)).astype(dtype)


def add_noise(original: jnp.ndarray, noise: jnp.ndarray, sigma) -> jnp.ndarray:
    """Forward-noise a clean latent to noise level sigma (img2img entry)."""
    return original + noise * sigma
