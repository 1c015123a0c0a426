"""Multi-host initialization.

The reference launches one process per GPU with torchrun and lets Accelerate
init the NCCL group (reference: scripts/train_seed_x_sft_comp_gen.sh:10,
train_seed_x_sft.py:147-156).  On TPU pods the runtime launches one process
per HOST; ``maybe_initialize()`` wires ``jax.distributed`` from the TPU
environment (or explicit coordinator env vars for CPU/GPU testing) and is a
no-op on a single host.
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np

logger = logging.getLogger(__name__)

_initialized = False


def put_global(x, sharding):
    """Place an array onto a (possibly multi-process) sharding.

    Single-process: plain ``device_put`` of the full array.  Multi-process
    (``jax.process_count() > 1``): ``x`` is this HOST'S slice of the global
    batch — the per-host data sharding contract (reference analogue: each
    torchrun rank's DistributedReadingService shard,
    src/train/train_seed_x_sft.py:78-85) — and the global array is
    assembled from every process's local shard without any cross-host
    data movement."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def maybe_initialize() -> None:
    """Idempotent ``jax.distributed.initialize()`` when running multi-host.

    Triggers: TPU pod env (``TPU_WORKER_HOSTNAMES``/megascale coordinator) or
    explicit ``JAX_COORDINATOR_ADDRESS``+``JAX_NUM_PROCESSES``+
    ``JAX_PROCESS_ID``.
    """
    global _initialized
    if _initialized:
        return
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]))
        _initialized = True
    elif os.environ.get("TPU_WORKER_HOSTNAMES") or \
            os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()   # auto-detect from TPU metadata
        _initialized = True
    if _initialized:
        logger.info("jax.distributed initialized: process %d/%d, %d local / "
                    "%d global devices", jax.process_index(),
                    jax.process_count(), jax.local_device_count(),
                    jax.device_count())
