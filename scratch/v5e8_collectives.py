"""v5e-8 projection evidence: count collectives + bytes in the compiled HLO
of (a) the tensor-sharded LLM decode step and (b) the CFG+row-sharded SDXL
denoise step, on a virtual 8-CPU mesh. Used for the PARITY.md derivation."""
import re
import jax, jax.numpy as jnp
import numpy as np
from flax import linen as nn

jax.config.update("jax_platforms", "cpu")
import os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

from seedx_tpu.parallel import create_mesh, shard_pytree
from seedx_tpu.parallel.mesh import DEFAULT_RULES

def count_collectives(compiled):
    txt = compiled.as_text()
    out = {}
    for op in ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all"):
        # count op starts with shapes to estimate bytes
        starts = re.findall(rf"(\S+) = \S* ?{op}\(", txt)
        # byte estimate: parse shapes like bf16[4,128]{...} on the result
        shapes = re.findall(rf"= (\w+)\[([\d,]*)\][^=]*? {op}\(", txt)
        nbytes = 0
        for dt, dims in shapes:
            n = 1
            for d in dims.split(","):
                if d: n *= int(d)
            sz = {"bf16": 2, "f32": 4, "s8": 1, "u8": 1, "s32": 4,
                  "f16": 2, "pred": 1}.get(dt, 2)
            nbytes += n * sz
        if starts:
            out[op] = (len(starts), nbytes)
    return out

# ---- (a) LLM decode step, tensor sharded -------------------------------
from seedx_tpu.models.llama import LlamaForCausalLM, llama_debug, init_kv_cache

for tensor in (2, 4, 8):
    mesh = create_mesh(data=1, fsdp=8 // tensor, tensor=tensor)
    cfg = llama_debug(hidden_size=256, intermediate_size=512, num_layers=2,
                      num_heads=8, num_kv_heads=8, vocab_pad_to=32336)
    model = LlamaForCausalLM(cfg)
    ids = jnp.zeros((1, 1), jnp.int32)
    pos = jnp.zeros((1, 1), jnp.int32)
    cache = init_kv_cache(cfg, 1, 128)
    params = model.init(jax.random.PRNGKey(0), ids, pos,
                        method="init_all")["params"]
    with mesh:
        params = shard_pytree(params, mesh)
        cache = jax.device_put(cache)
        @jax.jit
        def step(p, c):
            emb = model.apply({"params": p}, ids, method="embed")
            return model.apply({"params": p}, emb, pos, cache=c,
                               cache_index=jnp.int32(4))
        compiled = step.lower(params, cache).compile()
        print(f"LLM decode tensor={tensor}:", count_collectives(compiled))

# ---- (b) SDXL denoise step, CFG x rows sharded --------------------------
from seedx_tpu.models.sdxl.unet import UNet2DCondition, sdxl_debug_unet

mesh = create_mesh(data=2, fsdp=1, tensor=4)
ucfg = sdxl_debug_unet()
unet = UNet2DCondition(ucfg)
pooled_dim = ucfg.projection_class_embeddings_input_dim - 6 * ucfg.addition_time_embed_dim
lat = jnp.zeros((2, 32, 32, 4))
ctx = jnp.zeros((2, 8, ucfg.cross_attention_dim))
pooled = jnp.zeros((2, pooled_dim))
tids = jnp.zeros((2, 6))
params = unet.init(jax.random.PRNGKey(1), lat, jnp.array([1.0, 1.0]), ctx,
                   pooled, tids)["params"]
with mesh, nn.logical_axis_rules(DEFAULT_RULES):
    params = jax.device_put(params)
    from jax.sharding import NamedSharding, PartitionSpec as P
    lat_s = jax.device_put(lat, NamedSharding(mesh, P("data", "tensor")))
    @jax.jit
    def eval_unet(p, l):
        return unet.apply({"params": p}, l, jnp.array([1.0, 1.0]), ctx,
                          pooled, tids)
    compiled = eval_unet.lower(params, lat_s).compile()
    print("UNet denoise data=2 tensor=4:", count_collectives(compiled))
