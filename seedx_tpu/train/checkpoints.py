"""Checkpointing via orbax.

Replaces the reference's DeepSpeed sharded ``accelerator.save_state`` +
``zero_to_fp32.py`` consolidation + ``load_zero3_checkpoint`` gather dance
(reference: src/train/train_seed_x_sft.py:325-327, src/models/mllm/utils.py:19-83,
README.md:146-158).  Orbax writes/reads sharded arrays natively, so
save-sharded/restore-sharded/restore-consolidated are all the same call.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    """Step-indexed checkpoint directory: ``{dir}/checkpoint-{step}`` —
    mirrors the reference's naming (train_seed_x_sft.py:325-327)."""

    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            step_prefix="checkpoint",
            create=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def save_pytree(path: str, tree: Any) -> None:
    """One-shot save (e.g. frozen params exported once)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree)
    ckptr.wait_until_finished()


def restore_pytree(path: str, template: Any = None) -> Any:
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), template)
    return ckptr.restore(os.path.abspath(path))
