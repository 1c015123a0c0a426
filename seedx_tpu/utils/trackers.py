"""Metric tracker writers: jsonl + tensorboard events (+ optional wandb).

The reference logs through HF Accelerate's tracker layer to tensorboard and
wandb (reference: src/train/train_seed_x_sft.py:147-156 ``log_with=
['tensorboard', 'wandb']``, :232-241 tracker init, :331 ``accelerator.log``).
TPU-native equivalent: a small facade that fans one ``log(metrics, step)``
call out to

  * ``metrics.jsonl`` — one JSON object per logged step (always on; the
    tracker-agnostic record everything else can be derived from),
  * tensorboard event files under ``<output_dir>/tb/`` via
    ``torch.utils.tensorboard`` when importable (this environment ships it),
  * wandb in offline mode when importable AND ``WANDB_MODE`` != "disabled"
    (mirroring the reference's offline-mode default; silently skipped when
    the package is absent).

Writers that fail to initialise degrade to a warning, never an exception —
a tracker must not kill a multi-day run.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, Optional, Sequence

logger = logging.getLogger(__name__)


class MetricWriters:
    """Fan-out metric logger (reference: train_seed_x_sft.py:232-241,331)."""

    def __init__(self, output_dir: str,
                 trackers: Sequence[str] = ("jsonl", "tensorboard"),
                 expr_name: str = "", config: Optional[Dict] = None):
        os.makedirs(output_dir, exist_ok=True)
        self._jsonl = None
        self._tb = None
        self._wandb = None

        if "jsonl" in trackers:
            self._jsonl = open(os.path.join(output_dir, "metrics.jsonl"), "a")

        if "tensorboard" in trackers:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(
                    log_dir=os.path.join(output_dir, "tb"),
                    filename_suffix=("." + expr_name) if expr_name else "")
            except Exception as e:   # missing package, read-only fs, ...
                logger.warning("tensorboard tracker disabled: %s", e)

        if "wandb" in trackers and os.environ.get(
                "WANDB_MODE", "offline") != "disabled":
            try:
                import wandb

                # offline + local dir, like the reference's hardcoded
                # offline-mode tracker (train_seed_x_sft.py:232-241)
                self._wandb = wandb.init(
                    project=expr_name or "seedx_tpu", dir=output_dir,
                    mode=os.environ.get("WANDB_MODE", "offline"),
                    config=config or {})
            except Exception as e:
                logger.warning("wandb tracker disabled: %s", e)

    def log(self, metrics: Dict[str, float], step: int) -> None:
        if self._jsonl is not None:
            rec = dict(metrics)
            rec["step"] = step
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                try:
                    self._tb.add_scalar(k, float(v), global_step=step)
                except (TypeError, ValueError):
                    pass   # non-scalar entries stay jsonl-only
            self._tb.flush()
        if self._wandb is not None:
            self._wandb.log(dict(metrics), step=step)

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
            self._jsonl = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None
        if self._wandb is not None:
            self._wandb.finish()
            self._wandb = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
