"""SEED-X TPU: a TPU-native (JAX/XLA/Pallas/pjit) unified multimodal
comprehension + generation framework.

Re-implements the capabilities of AILab-CVC/SEED-X (reference layout documented
in SURVEY.md) with a TPU-first design:

  * pure-functional flax.linen models (ViT-bigG visual tokenizer, LLaMA2
    backbone, perceiver resamplers, SDXL de-tokenizer),
  * one device ``Mesh`` with ``data`` / ``fsdp`` / ``tensor`` axes and
    ``NamedSharding``-annotated parameters (the ZeRO-3 analogue),
  * jitted, donated train step; jitted prefill+decode with a preallocated KV
    cache; jitted diffusion sampling loop,
  * Pallas flash-attention kernels for the hot paths.
"""

__version__ = "0.1.0"

from seedx_tpu import config  # noqa: F401
