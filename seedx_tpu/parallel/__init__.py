from seedx_tpu.parallel.mesh import (  # noqa: F401
    DEFAULT_RULES,
    TP_RULES,
    create_mesh,
    local_mesh,
    logical_rules,
    mesh_sharding,
    shard_pytree,
    unbox,
)
