"""Full-geometry SDXL UNet eval on a virtual 8-CPU mesh (data=2 x tensor=4):
compile-only, count collectives + bytes for the v5e-8 projection.
"""
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from flax import linen as nn

from scratch.v5e8_collectives import count_collectives  # noqa: E402
from seedx_tpu.parallel import create_mesh
from seedx_tpu.parallel.mesh import DEFAULT_RULES
from seedx_tpu.models.sdxl.unet import UNet2DCondition, sdxl_base_unet

mesh = create_mesh(data=2, fsdp=1, tensor=4)
ucfg = sdxl_base_unet(param_dtype=jnp.bfloat16)
unet = UNet2DCondition(ucfg)
lat = jnp.zeros((2, 128, 128, 4), jnp.bfloat16)
ctx = jnp.zeros((2, 64, ucfg.cross_attention_dim), jnp.bfloat16)
pooled_dim = (ucfg.projection_class_embeddings_input_dim
              - 6 * ucfg.addition_time_embed_dim)
pooled = jnp.zeros((2, pooled_dim), jnp.bfloat16)
tids = jnp.zeros((2, 6), jnp.bfloat16)

shapes = jax.eval_shape(lambda: unet.init(
    jax.random.PRNGKey(1), lat, jnp.array([1.0, 1.0]), ctx, pooled,
    tids))["params"]
shapes = nn.meta.unbox(shapes)

with mesh, nn.logical_axis_rules(DEFAULT_RULES):
    from jax.sharding import NamedSharding, PartitionSpec as P

    lat_sh = jax.ShapeDtypeStruct(lat.shape, lat.dtype,
                                  sharding=NamedSharding(mesh,
                                                         P("data", "tensor")))

    def eval_unet(p, l):
        return unet.apply({"params": p}, l, jnp.array([1.0, 1.0]), ctx,
                          pooled, tids)

    compiled = jax.jit(eval_unet).lower(shapes, lat_sh).compile()
    print("UNet 1024p data=2 tensor=4:", count_collectives(compiled))
