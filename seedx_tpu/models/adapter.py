"""SDXL adapter: generated visual embeddings -> images.

Parity with the reference ``SDXLAdapter`` / ``SDXLAdapterWithLatentImage``
(reference: src/models/detokenizer/adapter_modules.py):
  * wraps UNet + detokenizer resampler,
  * training forward = diffusion MSE on predicted noise (:39-52),
  * CFG negatives = a zeros image pushed through the ViT (+ optional 4x
    pooling), NOT an empty-string text encoder (:96-130),
  * ``generate`` runs the jitted t2i pipeline; the latent-image variant adds
    the VAE-encoded condition image and 3-way CFG (:132-169,249-287),
  * trainable sets: resampler + UNet cross-attn to_k/to_v, or full FT, plus
    conv_in for the edit variant (:21-33,183-209) — expressed as optax label
    patterns here (ADAPTER_TRAINABLE_PATTERNS).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from seedx_tpu.models.detokenizer import DetokenizerConfig, ResamplerXL
from seedx_tpu.models.sdxl.pipeline import (SamplerConfig, decode_latents,
                                            default_time_ids, denoise_edit,
                                            denoise_text2image,
                                            prepare_latents)
from seedx_tpu.models.sdxl.scheduler import make_schedule
from seedx_tpu.models.sdxl.unet import UNet2DCondition, UNetConfig
from seedx_tpu.models.sdxl.vae import VAEDecoder, VAEEncoder, sample_moments
from seedx_tpu.models.vit import vit_downsample

# reference: adapter_modules.py:21-33 (to_k/to_v) + :204 (conv_in, edit).
ADAPTER_TRAINABLE_PATTERNS: Tuple[str, ...] = (
    r"resampler/.*",
    r"unet/.*attn\d/to_k/.*",
    r"unet/.*attn\d/to_v/.*",
    r"unet/conv_in/.*",
)


@dataclasses.dataclass(frozen=True)
class AdapterConfig:
    unet: UNetConfig
    resampler: DetokenizerConfig
    sampler: SamplerConfig = SamplerConfig()
    vit_down: bool = True
    with_latent_image: bool = False   # SEED-X-Edit variant


class SDXLAdapter:
    """Functional adapter bundling modules + params.

    Unlike the torch reference this is not an nn.Module: the UNet/VAE/
    resampler are separate flax modules with separate param trees, which
    keeps checkpoint granularity identical to the reference's release
    artifacts (UNet deltas / resampler / SDXL base)."""

    def __init__(self, cfg: AdapterConfig, unet_params: Any,
                 resampler_params: Any, vae_decoder_params: Any = None,
                 vae_encoder_params: Any = None,
                 visual_encoder=None, visual_encoder_params: Any = None,
                 vae_cfg=None):
        from seedx_tpu.models.sdxl.vae import VAEConfig

        self.cfg = cfg
        self.unet = UNet2DCondition(cfg.unet)
        self.resampler = ResamplerXL(cfg.resampler)
        self.vae_cfg = vae_cfg or VAEConfig()
        self.vae_decoder = VAEDecoder(self.vae_cfg)
        self.vae_encoder = VAEEncoder(self.vae_cfg)
        self.unet_params = unet_params
        self.resampler_params = resampler_params
        self.vae_decoder_params = vae_decoder_params
        self.vae_encoder_params = vae_encoder_params
        self.visual_encoder = visual_encoder
        self.visual_encoder_params = visual_encoder_params
        self.mesh = None                  # set by .shard()
        self.rules = None

    # ---- serving quantization -------------------------------------------

    def quantize_unet(self) -> "SDXLAdapter":
        """Switch the UNet to int8 weight-only serving (in place).

        Halves the 2.6B UNet's HBM footprint so the full image stack
        co-resides with the quantized LLM on one 16G chip.  Call before
        ``.shard()``/``generate``; no reference counterpart (it serves
        fp16, eval_text2img_seed_x_i.py:59-64)."""
        from seedx_tpu.utils.quantize import quantize_unet_params

        if self.cfg.unet.quantize == "int8":
            return self
        self.cfg = dataclasses.replace(
            self.cfg, unet=dataclasses.replace(self.cfg.unet,
                                               quantize="int8"))
        self.unet = UNet2DCondition(self.cfg.unet)
        self.unet_params = jax.tree.map(
            jnp.asarray, quantize_unet_params(
                jax.tree.map(np.asarray, self.unet_params)))
        return self

    # ---- SPMD placement ------------------------------------------------------

    def shard(self, mesh, rules=None) -> "SDXLAdapter":
        """SPMD denoising over a device mesh.

        The UNet/VAE/resampler weights replicate (2.6B bf16 fits per chip and
        every device needs every conv); the *activations* shard — CFG branches
        over the ``data`` axis and latent rows over ``tensor``, via the
        ``("cfg_batch", "height")`` logical constraints baked into the UNet
        forward (models/sdxl/unet.py).  GSPMD derives the conv halo exchanges
        and the gathers around self-attention.  Pick ``data`` ∈ {1, #CFG
        branches} (2 for t2i, 3 for edit) so the branch dim divides evenly.

        The reference runs the whole SDXL denoise on one GPU
        (pipeline_stable_diffusion_xl_t2i_edit.py:900-963); this is the
        v5e-8 scale-out path for the image side.
        """
        from jax.sharding import NamedSharding, PartitionSpec

        from seedx_tpu.parallel.mesh import DEFAULT_RULES

        rep = NamedSharding(mesh, PartitionSpec())
        put = lambda t: jax.tree.map(
            lambda x: jax.device_put(x, rep), t) if t is not None else None
        self.unet_params = put(self.unet_params)
        self.resampler_params = put(self.resampler_params)
        self.vae_decoder_params = put(self.vae_decoder_params)
        self.vae_encoder_params = put(self.vae_encoder_params)
        self.visual_encoder_params = put(self.visual_encoder_params)
        self.mesh = mesh
        self.rules = tuple(rules) if rules is not None else DEFAULT_RULES
        return self

    def _mesh_scope(self):
        """Context activating the mesh + logical rules for sharded denoise
        (a no-op nullcontext when .shard() was never called)."""
        import contextlib

        from flax import linen as nn

        if self.mesh is None:
            return contextlib.nullcontext()
        stack = contextlib.ExitStack()
        stack.enter_context(self.mesh)
        stack.enter_context(nn.logical_axis_rules(self.rules))
        return stack

    # ---- conditioning ------------------------------------------------------

    def encode_image_embeds(self, image_embeds: jnp.ndarray):
        """ViT/LLM features -> (prompt_embeds, pooled)
        (reference: adapter_modules.py:54-57)."""
        return self.resampler.apply({"params": self.resampler_params},
                                    image_embeds)

    def negative_image_embeds(self, batch: int, image_size: int = 448,
                              pool: bool = True):
        """A zeros image through the visual encoder — the CFG negative.

        ``pool`` mirrors the reference's provenance rule
        (adapter_modules.py:96-116): when the POSITIVE conditioning is LLM
        features (64 tokens) the zeros-image ViT output is vit_down-pooled to
        match; when the positive is raw ViT features (256 tokens,
        ``image_tensor`` path) the negative stays unpooled."""
        assert self.visual_encoder is not None, "init with visual encoder"
        zeros = jnp.zeros((1, image_size, image_size, 3), jnp.bfloat16)
        neg = self.visual_encoder.apply(
            {"params": self.visual_encoder_params}, zeros)
        if pool and self.cfg.vit_down:
            neg = vit_downsample(neg)
        return jnp.broadcast_to(neg, (batch, *neg.shape[1:]))

    def get_conditioning(self, image_embeds: jnp.ndarray,
                         negative_embeds: Optional[jnp.ndarray] = None,
                         from_vit: bool = False):
        b = image_embeds.shape[0]
        if negative_embeds is None:
            negative_embeds = self.negative_image_embeds(b, pool=not from_vit)
        both = jnp.concatenate([image_embeds, negative_embeds])
        prompt, pooled = self.encode_image_embeds(both)
        return (prompt[:b], prompt[b:], pooled[:b], pooled[b:])

    # ---- training ----------------------------------------------------------

    def diffusion_loss(self, unet_params, resampler_params, noisy_latents,
                       timesteps, image_embeds, noise, time_ids):
        """MSE on eps prediction (reference: adapter_modules.py:39-52)."""
        prompt, pooled = self.resampler.apply({"params": resampler_params},
                                              image_embeds)
        eps = self.unet.apply({"params": unet_params}, noisy_latents,
                              timesteps, prompt, pooled, time_ids)
        loss = jnp.mean((eps.astype(jnp.float32)
                         - noise.astype(jnp.float32)) ** 2)
        return {"total_loss": loss, "noise_pred": eps}

    # ---- generation --------------------------------------------------------

    def generate(self, image_embeds: jnp.ndarray,
                 latent_image: Optional[jnp.ndarray] = None,
                 negative_embeds: Optional[jnp.ndarray] = None,
                 from_vit: bool = False,
                 seed: int = 42,
                 num_inference_steps: Optional[int] = None,
                 guidance_scale: Optional[float] = None,
                 image_guidance_scale: Optional[float] = None,
                 solver: Optional[str] = None) -> np.ndarray:
        """image_embeds [B, T, 4096] -> images [B, H, W, 3] float32 in [0,1].

        from_vit: conditioning is raw ViT features (detokenizer recon path)
        rather than LLM output-resampler features — selects the unpooled CFG
        negative (reference: adapter_modules.py:96-116).
        latent_image: condition image [B, H, W, 3] in [-1, 1] (edit variant,
        VAE-encoded with the mode — reference pipeline...py:523).
        """
        cfg = self.cfg.sampler
        steps = num_inference_steps or cfg.num_inference_steps
        g = guidance_scale if guidance_scale is not None else cfg.guidance_scale
        gi = (image_guidance_scale if image_guidance_scale is not None
              else cfg.image_guidance_scale)
        schedule = make_schedule(steps, solver=solver or cfg.solver)
        b = image_embeds.shape[0]

        with self._mesh_scope():
            return self._generate_inner(
                image_embeds, latent_image, negative_embeds, from_vit, seed,
                steps, g, gi, schedule, cfg, b)

    def _generate_inner(self, image_embeds, latent_image, negative_embeds,
                        from_vit, seed, steps, g, gi, schedule, cfg, b):
        prompt, neg_prompt, pooled, neg_pooled = self.get_conditioning(
            image_embeds, negative_embeds, from_vit=from_vit)
        rng = jax.random.PRNGKey(seed)
        latents = prepare_latents(rng, b, cfg, schedule)
        time_ids = default_time_ids(cfg, b)

        if self.cfg.with_latent_image:
            # 8-channel UNet: without a condition image the reference concats
            # zeros (pipeline...py:909-910), so t2i also routes through the
            # edit denoiser.
            if latent_image is not None:
                moments = self.vae_encoder.apply(
                    {"params": self.vae_encoder_params}, latent_image)
                image_latents = sample_moments(moments)  # .mode()
            else:
                image_latents = jnp.zeros_like(latents)
            final = denoise_edit(
                self.unet, self.unet_params, schedule, latents, image_latents,
                prompt, neg_prompt, pooled, neg_pooled, time_ids,
                guidance_scale=g, image_guidance_scale=gi,
                guidance_rescale=cfg.guidance_rescale)
        else:
            final = denoise_text2image(
                self.unet, self.unet_params, schedule, latents,
                prompt, neg_prompt, pooled, neg_pooled, time_ids,
                guidance_scale=g, guidance_rescale=cfg.guidance_rescale)

        images = decode_latents(self.vae_decoder, self.vae_decoder_params,
                                final, cfg.vae_scaling_factor)
        return np.asarray(images)
