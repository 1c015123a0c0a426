"""Loaders for the reference's torch modules, used as numerical oracles.

The reference implementations under /root/reference are importable on this
box (torch is installed); the modules needing CUDA-era deps get lightweight
stubs injected into sys.modules first:

  * ``qwen_visual.py`` imports torchvision (only to build an image
    transform we never call) and ``src.models.mllm.utils`` (only for
    checkpoint loading we never call) -> both stubbed.
  * ``detokenizer/resampler.py`` is torch-only -> imported directly.

These loaders live in tests/ because the oracles are test-only: the
framework itself never imports reference code.
"""

from __future__ import annotations

import importlib.util
import sys
import types

REF_MODELS = "/root/reference/src/models"


def _load_file(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


class _Stubs:
    """Temporarily inject stub modules; ALWAYS remove them afterwards —
    a lingering fake ``torchvision`` makes transformers think the real
    package is importable and breaks unrelated tests in the same session."""

    def __init__(self):
        self.added = []

    def add(self, name: str, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        self.added.append(name)
        return mod

    def cleanup(self):
        for name in self.added:
            sys.modules.pop(name, None)


def load_reference_detok_resampler():
    """reference: src/models/detokenizer/resampler.py (torch-only)."""
    return _load_file("ref_detok_resampler",
                      f"{REF_MODELS}/detokenizer/resampler.py")


def load_reference_qwen_visual():
    """reference: src/models/tokenizer/qwen_visual.py with torchvision and
    the deepspeed-importing checkpoint util stubbed out (stubs removed from
    sys.modules again once the module is loaded)."""
    if "ref_qwen_visual" in sys.modules:
        return sys.modules["ref_qwen_visual"]

    class _InterpolationMode:
        BICUBIC = "bicubic"

    stubs = _Stubs()
    try:
        transforms = stubs.add(
            "torchvision.transforms",
            InterpolationMode=_InterpolationMode,
            Compose=lambda *a, **k: (lambda x: x),
            Resize=lambda *a, **k: None,
            ToTensor=lambda *a, **k: None,
            Normalize=lambda *a, **k: None)
        stubs.add("torchvision", transforms=transforms)

        stubs.add("src")
        stubs.add("src.models")
        stubs.add("src.models.mllm")
        stubs.add(
            "src.models.mllm.utils",
            load_zero3_checkpoint=lambda module, sd, **k:
                module.load_state_dict(sd))

        return _load_file("ref_qwen_visual",
                          f"{REF_MODELS}/tokenizer/qwen_visual.py")
    finally:
        stubs.cleanup()
