"""SeedXRuntime — everything the 7 reference inference scripts construct,
bundled once.

The reference scripts each rebuild tokenizer / transforms / ViT / LLM /
agent / SDXL adapter from YAML (reference: src/inference/eval_*.py, e.g.
eval_img2text_seed_x_i.py:66-117).  Here one runtime object owns:

  * tokenizer (+ multimodal vocab),
  * image transform + anyres tiling config,
  * ViT visual encoder (flax) with params,
  * ContinuousLVLM agent with params,
  * optional SDXL adapter (detokenizer resampler + UNet + VAE).

``SeedXRuntime.debug()`` builds the tiny random stack (the analogue of the
reference DEBUG_FLAG mode, peft_models.py:38-47) so every app runs end-to-end
without the released 17B weights; ``from_checkpoints(...)`` loads converted
weights (seedx_tpu/utils/weights.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from seedx_tpu.data.anyres import (grid_pinpoints_from_strings,
                                   process_anyres_image)
from seedx_tpu.data.transforms import get_transform
from seedx_tpu.models.agent import AgentConfig, ContinuousLVLM
from seedx_tpu.models.generation import GenerationConfig, generate
from seedx_tpu.models.llama import llama_debug
from seedx_tpu.models.vit import (ViTConfig, VisionTransformer,
                                  vit_downsample, vit_tiny_debug)
from seedx_tpu.text.tokenizer import load_tokenizer

DEFAULT_RESOLUTION_GRIDS = ("1x1", "1x2", "1x3", "2x1", "3x1", "1x4", "4x1",
                            "2x2")  # eval_img2text_seed_x_i.py:57


@dataclasses.dataclass
class SeedXRuntime:
    tokenizer: Any
    vit_cfg: ViTConfig
    vit: VisionTransformer
    vit_params: Any
    agent_cfg: AgentConfig
    agent: ContinuousLVLM
    agent_params: Any
    adapter: Optional[Any] = None            # SDXLAdapter
    base_resolution: int = 448
    resolution_grids: Sequence[str] = DEFAULT_RESOLUTION_GRIDS
    vit_down: bool = True
    mesh: Optional[Any] = None               # set by .shard()
    # Anyres tile-count buckets for the ViT encode: each distinct tile count
    # (2..5 under the default grids) compiles a separate ViT program; in a
    # serving deployment set e.g. (5,) to pad every image to one bucket
    # (one compile, ~padded-tile extra compute) or (3, 5) to trade.  None =
    # exact counts (no padded compute, up to len(grids) compiles).
    tile_buckets: Optional[Sequence[int]] = None

    # ---- constructors ------------------------------------------------------

    @classmethod
    def from_checkpoints(
        cls,
        vit_path: Optional[str] = None,        # pretrained/QwenViT/qwen_vit_G.pt
        llm_path: Optional[str] = None,        # pretrained/seed_x*/llm/...
        agent_path: Optional[str] = None,      # pretrained/seed_x*/agent/...
        tokenizer_path: Optional[str] = None,
        detokenizer_path: Optional[str] = None,  # seed_detokenizer stage ckpt
        sdxl_unet_path: Optional[str] = None,    # SDXL base unet safetensors
        sdxl_vae_path: Optional[str] = None,
        lora_rank: int = 32,
        with_latent_image: bool = False,         # Edit variant
        quantization: str = "none",
        vit_quantization: str = "none",          # "int8" = serving co-residency
        unet_quantization: str = "none",         # "int8" = serving co-residency
        validate: bool = False,                  # manifest-check before convert
    ) -> "SeedXRuntime":
        """Assemble the full runtime from converted release artifacts
        (the four checkpoints a SEED-X user has on disk; reference
        README.md:74-158 + eval script setup eval_img2text_seed_x_i.py:66-117).

        ``validate=True`` checks every loaded state dict against the pinned
        release manifests (utils/manifest.py) and fails with a key/shape
        diff BEFORE conversion — the first-try-success guard for the day
        the released 17B artifacts are on disk.
        """
        from seedx_tpu.models.factory import (build_agent, build_llm_config,
                                              build_sdxl_adapter,
                                              build_visual_encoder)

        vit, vit_params = build_visual_encoder(pretrained_model_path=vit_path,
                                               validate=validate)
        llm_cfg = build_llm_config(lora_rank=lora_rank,
                                   quantization=quantization)
        agent, agent_params = build_agent(
            llm_cfg, pretrained_llm_path=llm_path,
            pretrained_agent_path=agent_path, validate=validate)

        adapter = None
        if sdxl_unet_path or detokenizer_path:
            adapter = build_sdxl_adapter(
                detokenizer_path=detokenizer_path,
                sdxl_unet_path=sdxl_unet_path,
                sdxl_vae_path=sdxl_vae_path,
                with_latent_image=with_latent_image,
                visual_encoder=vit, visual_encoder_params=vit_params,
                validate=validate)

        rt = cls(tokenizer=load_tokenizer(tokenizer_path),
                 vit_cfg=vit.cfg, vit=vit, vit_params=vit_params,
                 agent_cfg=agent.cfg, agent=agent,
                 agent_params=agent_params, adapter=adapter)
        if vit_quantization == "int8":
            rt.quantize_vit()
        if unet_quantization == "int8" and adapter is not None:
            adapter.quantize_unet()
        return rt

    # The released artifact layout under ``pretrained/`` (reference
    # README.md:74-87 + configs/clm_models/*_seed_x*.yaml paths).
    RELEASE_MODELS = ("seed_x", "seed_x_i", "seed_x_edit")

    @classmethod
    def from_pretrained(
        cls,
        root: str = "pretrained",
        model: str = "seed_x_i",
        with_adapter: bool = True,
        validate: bool = True,
        **kw,
    ) -> "SeedXRuntime":
        """One-call constructor over the release checkpoint layout.

        Maps the directory structure the reference README tells users to
        create (README.md:74-87; config paths agent_seed_x_i.yaml:23,
        llm_seed_x_i.yaml:2, qwen_vitg_448.yaml:11,
        sdxl_qwen_vit_resampler_l4_q64*.yaml) onto ``from_checkpoints``:

            <root>/QwenViT/qwen_vit_G.pt
            <root>/<model>/llm/                  (HF shards dir)
            <root>/<model>/agent/pytorch_model.bin
            <root>/seed_detokenizer/first_stage/pytorch_model.bin
                                   (second_stage for the edit variant)
            <root>/stable-diffusion-xl-base-1.0/{unet,vae}/

        ``model`` is one of ``seed_x`` (foundation), ``seed_x_i``
        (instruct), ``seed_x_edit`` (editing — switches on the
        latent-image UNet + second-stage detokenizer).  Missing optional
        pieces (detokenizer/SDXL when ``with_adapter=False``) are skipped;
        a missing REQUIRED piece raises FileNotFoundError listing what the
        README says to download.  ``validate=True`` (default here, unlike
        ``from_checkpoints``) manifest-checks every artifact first.
        """
        import os

        if model not in cls.RELEASE_MODELS:
            raise ValueError(f"model must be one of {cls.RELEASE_MODELS}, "
                             f"got {model!r}")
        edit = model == "seed_x_edit"
        vit_path = os.path.join(root, "QwenViT", "qwen_vit_G.pt")
        llm_path = os.path.join(root, model, "llm")
        agent_path = os.path.join(root, model, "agent", "pytorch_model.bin")
        stage = "second_stage" if edit else "first_stage"
        detok_path = os.path.join(root, "seed_detokenizer", stage,
                                  "pytorch_model.bin")
        sdxl = os.path.join(root, "stable-diffusion-xl-base-1.0")
        unet_path, vae_path = (os.path.join(sdxl, "unet"),
                               os.path.join(sdxl, "vae"))

        required = {"QwenViT visual encoder (run the reference's "
                    "src/tools/reload_qwen_vit.py)": vit_path,
                    f"{model} LLM shards": llm_path,
                    f"{model} agent checkpoint": agent_path}
        if with_adapter:
            required.update({
                f"seed_detokenizer {stage}": detok_path,
                "SDXL base UNet": unet_path, "SDXL base VAE": vae_path})
        missing = {what: p for what, p in required.items()
                   if not os.path.exists(p)}
        if missing:
            raise FileNotFoundError(
                "missing release artifacts under "
                f"{root!r} (download per reference README.md:74-87):\n"
                + "\n".join(f"  {p}  <- {what}"
                            for what, p in missing.items()))
        return cls.from_checkpoints(
            vit_path=vit_path, llm_path=llm_path, agent_path=agent_path,
            detokenizer_path=detok_path if with_adapter else None,
            sdxl_unet_path=unet_path if with_adapter else None,
            sdxl_vae_path=vae_path if with_adapter else None,
            with_latent_image=edit, validate=validate, **kw)

    @classmethod
    def debug(cls, seed: int = 0, with_adapter: bool = False,
              image_size: int = 56) -> "SeedXRuntime":
        """Tiny random stack; runs everywhere (tests, demos, CI)."""
        rng = jax.random.PRNGKey(seed)
        vit_cfg = vit_tiny_debug(image_size=image_size, output_dim=64)
        vit = VisionTransformer(vit_cfg, remat=False)
        n_tok = (image_size // vit_cfg.patch_size) ** 2
        vit_params = vit.init(
            rng, jnp.zeros((1, image_size, image_size, 3)))["params"]

        llm_cfg = llama_debug(hidden_size=128, intermediate_size=256,
                              num_layers=2, num_heads=4, num_kv_heads=4)
        # tiny ViT emits 4 queries; disable vit_down and match token counts
        agent_cfg = AgentConfig(llm=llm_cfg, vit_dim=64, resampler_heads=4,
                                num_img_in_tokens=64,
                                num_img_out_tokens=vit_cfg.n_queries,
                                vit_down=False)
        agent = ContinuousLVLM(agent_cfg)
        B, S, N = 1, 80, 1
        ids = jnp.zeros((B, S), jnp.int32)
        attn = jnp.ones((B, S), bool)
        img = jnp.zeros((N, vit_cfg.n_queries, 64), jnp.bfloat16)
        fmask = jnp.zeros((N,), bool)
        idsm = jnp.zeros((B, S), bool).at[0, 1:1 + agent_cfg.num_img_out_tokens].set(True)
        agent_params = agent.init(
            rng, ids, attn, jnp.where(attn, ids, -100), img, fmask,
            fmask, idsm, idsm, jnp.full((N, 2), 0.5),
            method="init_all")["params"]

        adapter = None
        if with_adapter:
            from seedx_tpu.models.adapter import AdapterConfig, SDXLAdapter
            from seedx_tpu.models.detokenizer import DetokenizerConfig
            from seedx_tpu.models.sdxl.pipeline import SamplerConfig
            from seedx_tpu.models.sdxl.unet import (UNet2DCondition,
                                                    sdxl_debug_unet)
            from seedx_tpu.models.sdxl.vae import (VAEDecoder, VAEEncoder,
                                                   vae_debug)

            ucfg = sdxl_debug_unet(in_channels=8)
            rcfg = DetokenizerConfig(dim=64, depth=1, dim_head=16, heads=4,
                                     num_queries=8, embedding_dim=64,
                                     output1_dim=24,
                                     output2_dim=ucfg.projection_class_embeddings_input_dim
                                     - 6 * ucfg.addition_time_embed_dim,
                                     ff_mult=2)
            rcfg = dataclasses.replace(
                rcfg, output1_dim=ucfg.cross_attention_dim - rcfg.output2_dim)
            vcfg = vae_debug()
            acfg = AdapterConfig(unet=ucfg, resampler=rcfg,
                                 sampler=SamplerConfig(
                                     height=64, width=64,
                                     num_inference_steps=3,
                                     vae_scale=2),
                                 vit_down=False, with_latent_image=True)
            unet = UNet2DCondition(ucfg)
            lat = jnp.zeros((1, 32, 32, ucfg.in_channels))
            unet_params = unet.init(
                rng, lat, jnp.array([1.0]),
                jnp.zeros((1, 8, ucfg.cross_attention_dim)),
                jnp.zeros((1, rcfg.output2_dim)), jnp.zeros((1, 6)))["params"]
            from seedx_tpu.models.detokenizer import ResamplerXL

            res = ResamplerXL(rcfg)
            res_params = res.init(
                rng, jnp.zeros((1, 4, rcfg.embedding_dim)))["params"]
            dec = VAEDecoder(vcfg)
            dec_params = dec.init(rng, jnp.zeros((1, 32, 32, 4)))["params"]
            enc = VAEEncoder(vcfg)
            enc_params = enc.init(rng, jnp.zeros((1, 64, 64, 3)))["params"]
            adapter = SDXLAdapter(acfg, unet_params, res_params, dec_params,
                                  enc_params, visual_encoder=vit,
                                  visual_encoder_params=vit_params,
                                  vae_cfg=vcfg)

        return cls(tokenizer=load_tokenizer(), vit_cfg=vit_cfg, vit=vit,
                   vit_params=vit_params, agent_cfg=agent_cfg, agent=agent,
                   agent_params=agent_params, adapter=adapter,
                   base_resolution=image_size, vit_down=False)

    def quantize_vit(self) -> "SeedXRuntime":
        """Switch the visual encoder to int8 trunk weights (in place).

        ViT-bigG drops 3.8 -> 1.9 GB so the full stack (int4 LLM + int8
        UNet + ViT) co-resides on one 16G chip; encode is compute-bound so
        throughput is unchanged.  Call before ``.shard()``; no reference
        counterpart (it serves fp16, eval_img2text_seed_x_i.py:58)."""
        from flax import linen as nn

        from seedx_tpu.utils.quantize import quantize_vit_params

        if self.vit_cfg.quantization == "int8":
            return self
        self.vit_cfg = dataclasses.replace(self.vit_cfg, quantization="int8")
        remat = self.vit.remat
        shared = (self.adapter is not None
                  and self.adapter.visual_encoder is self.vit)
        self.vit = VisionTransformer(self.vit_cfg, remat=remat)
        self.vit_params = jax.tree.map(jnp.asarray, quantize_vit_params(
            jax.tree.map(np.asarray, nn.meta.unbox(self.vit_params))))
        if shared:
            self.adapter.visual_encoder = self.vit
            self.adapter.visual_encoder_params = self.vit_params
        return self

    # ---- SPMD placement ----------------------------------------------------

    def shard(self, mesh: Optional[Any] = None, rules: Optional[Any] = None
              ) -> "SeedXRuntime":
        """Place every parameter tree on a device mesh for SPMD inference.

        The serving deployment target is multi-turn chat "bf16 sharded on a
        v5e-8 pod slice" — where the reference replicates the whole 17B stack
        per GPU, here the agent/LLM and ViT weights shard per the logical
        rules (embed on ``fsdp``, heads/mlp/vocab on ``tensor``) and XLA's
        SPMD partitioner inserts the collectives; nothing in the forward
        changes.  SDXL adapter weights stay replicated (every device needs
        every conv) but the denoise ACTIVATIONS shard — CFG branches over
        ``data``, latent rows over ``tensor`` via the UNet's logical
        constraints (see ``SDXLAdapter.shard``).

        The Pallas flash kernel partitions natively on >1-device meshes
        (custom_partitioning over batch/head dims — ops/flash_attention.py),
        so no attention fallback is needed.
        """
        from seedx_tpu.models.factory import abstract_params, agent_init_fn
        from seedx_tpu.parallel.mesh import (DEFAULT_RULES, local_mesh,
                                             place_params)

        mesh = mesh if mesh is not None else local_mesh()
        rules = tuple(rules) if rules is not None else DEFAULT_RULES

        dummy = jnp.zeros((1, self.vit_cfg.image_size,
                           self.vit_cfg.image_size, 3), jnp.float32)
        vit_abs = abstract_params(self.vit, dummy)
        self.vit_params = place_params(self.vit_params, vit_abs, mesh, rules)
        agent_abs = jax.eval_shape(agent_init_fn(self.agent))["params"]
        self.agent_params = place_params(self.agent_params, agent_abs, mesh,
                                         rules)

        if self.adapter is not None:
            shared_vit = self.adapter.visual_encoder is self.vit
            if shared_vit:    # re-linked to the fsdp-sharded copy below
                self.adapter.visual_encoder_params = None
            self.adapter.shard(mesh, rules)
            if shared_vit:
                self.adapter.visual_encoder_params = self.vit_params

        self.mesh = mesh
        return self

    # ---- vision ------------------------------------------------------------

    def image_transform(self):
        return get_transform("clip", keep_ratio=False,
                             image_size=self.base_resolution)

    def grid_pinpoints(self):
        return grid_pinpoints_from_strings(self.resolution_grids,
                                           self.base_resolution)

    def encode_image_anyres(self, image, tile_buckets=None):
        """PIL image -> (vit_embeds [n_tiles+1, T, D], patch_pos
        [n_tiles+1, 2]) (reference: eval_img2text_seed_x_i.py:132-141).

        With ``tile_buckets`` set (explicit argument wins over the runtime
        default — engines pass their own so a shared runtime is never
        mutated), the tile stack is zero-padded to the next bucket before the
        ViT runs (bounding the number of distinct compiled ViT programs) and
        sliced back after — callers see exact shapes either way."""
        tiles, patch_pos = process_anyres_image(
            image, self.image_transform(), self.grid_pinpoints(),
            self.base_resolution)
        n = tiles.shape[0]
        buckets = (tile_buckets if tile_buckets is not None
                   else self.tile_buckets)
        if buckets:
            nb = next((x for x in sorted(buckets) if x >= n), n)
            if nb > n:
                tiles = np.concatenate(
                    [tiles, np.zeros((nb - n, *tiles.shape[1:]),
                                     tiles.dtype)])
        embeds = self.vit.apply({"params": self.vit_params},
                                jnp.asarray(tiles))
        return embeds[:n], jnp.asarray(patch_pos)

    def encode_image_single(self, image):
        """One 448px crop -> [1, T, D]."""
        arr = self.image_transform()(image)
        return self.vit.apply({"params": self.vit_params},
                              jnp.asarray(arr)[None])

    def pool_vit(self, embeds):
        return vit_downsample(embeds) if self.vit_down else embeds

    # ---- language ----------------------------------------------------------

    def generate(self, input_ids, image_embeds=None, embeds_cmp_mask=None,
                 ids_cmp_mask=None, patch_positions=None,
                 max_new_tokens: int = 512, **kw):
        gen_cfg = GenerationConfig(
            max_new_tokens=max_new_tokens,
            num_img_gen_tokens=self.agent_cfg.num_img_out_tokens,
            eos_token_id=self.tokenizer.eos_token_id,
            pad_token_id=self.tokenizer.pad_token_id, **kw)
        return generate(self.agent, {"params": self.agent_params},
                        self.tokenizer, input_ids,
                        image_embeds=image_embeds,
                        embeds_cmp_mask=embeds_cmp_mask,
                        ids_cmp_mask=ids_cmp_mask,
                        patch_positions=patch_positions,
                        gen_cfg=gen_cfg)

    def generate_batch(self, requests, max_new_tokens: int = 512, **kw):
        """Batched serving: ONE prefill+decode launch over many request
        dicts (see models/generation.generate_batch for the request schema).
        The reference loops HF generate one prompt at a time."""
        from seedx_tpu.models.generation import generate_batch

        gen_cfg = GenerationConfig(
            max_new_tokens=max_new_tokens,
            num_img_gen_tokens=self.agent_cfg.num_img_out_tokens,
            eos_token_id=self.tokenizer.eos_token_id,
            pad_token_id=self.tokenizer.pad_token_id, **kw)
        return generate_batch(self.agent, {"params": self.agent_params},
                              self.tokenizer, requests, gen_cfg=gen_cfg)
