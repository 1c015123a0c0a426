"""Device mesh + sharding helpers.

The reference scales with DeepSpeed ZeRO-2/3 over NCCL
(reference: configs/accelerate/stage3_fp16_dp.json, scripts/train_seed_x_sft_comp_gen.sh:35).
The TPU-native equivalent is a single ``jax.sharding.Mesh`` with three axes:

  * ``data``  — batch sharding (their torchrun DP axis),
  * ``fsdp``  — fully-sharded parameters + optimizer state (the ZeRO-3
    analogue; XLA schedules the allgather/reduce-scatter pipeline that
    DeepSpeed configures by hand),
  * ``tensor`` — optional tensor parallelism for the 13B backbone (absent in
    the reference, first-class here).

Parameters are annotated with *logical* axis names inside the flax modules
(``nn.with_logical_partitioning``); the tables below map logical names to mesh
axes.  Activations use the same mechanism via ``nn.with_logical_constraint``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec

# Logical axis vocabulary used across all models:
#   "batch"       batch dim of activations
#   "seq"         sequence dim of activations
#   "embed"       model embedding / hidden dim
#   "mlp"         MLP hidden dim
#   "heads"       attention heads dim (fused head*head_dim when 2D)
#   "kv"          kv projection input dim
#   "vocab"       vocabulary dim
#   "conv_io"     conv output-channel dim
#   "layers"      stacked-scan layer dim (never sharded)

# Pure-FSDP rules (ZeRO-3 analogue): every weight shards its embed/vocab dim
# over the fsdp axis; batch shards over (data, fsdp) jointly so a 1-axis fsdp
# mesh still does data-parallel input sharding.
DEFAULT_RULES: Tuple[Tuple[str, Any], ...] = (
    ("batch", ("data", "fsdp")),
    ("images", ("data", "fsdp")),
    ("seq", None),
    ("embed", "fsdp"),
    ("mlp", "tensor"),
    ("heads", "tensor"),
    ("kv", None),
    ("vocab", "tensor"),
    ("conv_io", None),
    ("layers", None),
    ("queries", None),
    # SDXL denoise activations (models/sdxl/unet.py): CFG branches ride the
    # data axis, the latent height dim shards over tensor — GSPMD inserts the
    # conv halo exchanges.  No-ops unless the caller activates
    # ``nn.logical_axis_rules`` under a mesh (SDXLAdapter.shard).
    ("cfg_batch", "data"),
    ("height", "tensor"),
)

# FSDP + tensor-parallel rules for the 13B backbone on larger slices.
TP_RULES: Tuple[Tuple[str, Any], ...] = DEFAULT_RULES


def create_mesh(
    data: int = 1,
    fsdp: int = -1,
    tensor: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a ('data', 'fsdp', 'tensor') mesh.  One axis may be -1 (infer)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    sizes = [data, fsdp, tensor]
    if sizes.count(-1) > 1:
        raise ValueError("at most one mesh axis may be -1")
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        if n % known:
            raise ValueError(f"{n} devices not divisible by {known}")
        sizes[sizes.index(-1)] = n // known
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh {sizes} != {n} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, ("data", "fsdp", "tensor"))


def local_mesh() -> Mesh:
    """All local devices on the fsdp axis (single-host default)."""
    return create_mesh()


def logical_rules(extra: Sequence[Tuple[str, Any]] = ()) -> Tuple[Tuple[str, Any], ...]:
    return tuple(extra) + DEFAULT_RULES


def mesh_sharding(mesh: Mesh, *logical_axes: Optional[str],
                  rules: Sequence[Tuple[str, Any]] = DEFAULT_RULES) -> NamedSharding:
    """NamedSharding for an array whose dims carry the given logical names."""
    spec = nn.logical_to_mesh_axes(PartitionSpec(*logical_axes), rules=tuple(rules))
    return NamedSharding(mesh, spec)


def unbox(tree: Any) -> Any:
    """Strip flax Partitioned metadata boxes, returning raw arrays."""
    return nn.meta.unbox(tree)


def shard_pytree(tree: Any, mesh: Mesh,
                 rules: Sequence[Tuple[str, Any]] = DEFAULT_RULES) -> Any:
    """Device-put a (possibly Partitioned-boxed) param tree onto the mesh.

    Returns the unboxed tree with every leaf placed according to its logical
    annotation (replicated when unannotated).
    """
    specs = nn.get_partition_spec(tree)
    shardings = nn.logical_to_mesh_sharding(specs, mesh, tuple(rules))
    raw = unbox(tree)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s),
        raw,
        shardings,
    )


def place_params(raw_tree: Any, boxed_abstract: Any, mesh: Mesh,
                 rules: Sequence[Tuple[str, Any]] = DEFAULT_RULES) -> Any:
    """Device-put an UNBOXED param tree using the logical annotations of a
    matching boxed abstract tree (from ``jax.eval_shape`` of the init).

    The checkpoint-loading path hands around raw arrays; this recovers the
    sharding layout that ``shard_pytree`` gets for free on freshly-init trees.
    """
    shardings = nn.logical_to_mesh_sharding(
        nn.get_partition_spec(boxed_abstract), mesh, tuple(rules))
    return jax.tree.map(lambda x, s: jax.device_put(x, s),
                        unbox(raw_tree), shardings)


def sharding_of(tree: Any, mesh: Mesh,
                rules: Sequence[Tuple[str, Any]] = DEFAULT_RULES) -> Any:
    """NamedSharding pytree for a boxed param tree (for jit in/out shardings)."""
    return nn.logical_to_mesh_sharding(nn.get_partition_spec(tree), mesh, tuple(rules))
