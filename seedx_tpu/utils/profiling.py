"""Profiling + numerical-health utilities.

The reference has no first-party tracing (SURVEY.md §5: tqdm step timing
only) and relies on print-probes for NaN/Inf in the LLM forward
(modeling_llama_xformer.py:702-714,731-735).  TPU-native upgrades:

  * ``trace(logdir)`` — context manager around ``jax.profiler`` (open the
    trace with xprof/tensorboard),
  * ``annotate(name)`` — ``TraceAnnotation`` for labelling custom regions,
  * ``check_finite(tree)`` — jitted all-finite probe over any pytree,
  * ``StepTimer`` — wall-clock steps/sec with EMA, the tqdm analogue.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Iterator, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


@jax.jit
def _finite_mask(leaves):
    return jnp.array([jnp.all(jnp.isfinite(x.astype(jnp.float32)))
                      for x in leaves])


def check_finite(tree: Any) -> dict:
    """Returns {path: bool} for every non-finite leaf (empty dict = healthy).

    The SPMD-safe replacement for the reference's NaN print probes: call it
    from the host loop on metrics or (sparingly) params."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(tree, sep="/") \
        if isinstance(tree, dict) else {"value": tree}
    leaves = [jnp.asarray(v) for v in flat.values()]
    if not leaves:
        return {}
    finite = _finite_mask(leaves)
    return {k: False for k, ok in zip(flat, finite) if not bool(ok)}


class StepTimer:
    def __init__(self, ema: float = 0.9):
        self._ema = ema
        self._rate: Optional[float] = None
        self._last = time.perf_counter()

    def tick(self, steps: int = 1) -> float:
        now = time.perf_counter()
        rate = steps / max(now - self._last, 1e-9)
        self._last = now
        self._rate = rate if self._rate is None else (
            self._ema * self._rate + (1 - self._ema) * rate)
        return self._rate
