"""Inspect the optimized HLO of the paged decode chunk for pool-sized copies.

Hypothesis (NOTES_r3 open item 2): the paged pool scatter
(`buf.at[li, pool_rows].set`) defeats in-place updates somewhere in the
while_loop -> fori_loop nesting, inserting full-pool copies per decode step
(~40 layers x pool bytes would match the observed ~110 ms/step at 13B).

Run on CPU: copy-insertion is a backend-shared HLO pass, so a pool-shaped
`copy` showing up here is strong evidence for the TPU behavior too.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import re

import jax
import jax.numpy as jnp

from seedx_tpu.models.llama import (LlamaConfig, LlamaForCausalLM,
                                    init_paged_kv_pool)

cfg = LlamaConfig(
    vocab_size=128, hidden_size=256, intermediate_size=512, num_layers=4,
    num_heads=8, num_kv_heads=8, quantization="int4",
    kv_quantization="int8", stacked_decode="force",
    decode_attention="force")

from seedx_tpu.ops import int4_matmul as int4_mod

int4_mod.FORCE_KERNEL = True

model = LlamaForCausalLM(cfg)
b, page, s_max = 4, 64, 256
pool_rows = 16 * page
rng = jax.random.PRNGKey(0)

cache = init_paged_kv_pool(cfg, pool_rows)
tables = jnp.tile(jnp.arange(s_max // page, dtype=jnp.int32), (b, 1))
pos = jnp.full((b,), 32, jnp.int32)
kv_valid = jnp.arange(s_max)[None, :] <= pos[:, None]
embeds = jnp.zeros((b, 1, cfg.hidden_size), cfg.dtype)
params = model.init(rng, embeds, pos[:, None])


def step(params, embeds, pos, kv_valid, cache, tables):
    logits, hidden, cache = model.apply(
        params, embeds, pos[:, None], kv_valid, cache, pos,
        block_tables=tables)
    return logits, cache


jitted = jax.jit(step, donate_argnums=(4,))
lowered = jitted.lower(params, embeds, pos, kv_valid, cache, tables)
compiled = lowered.compile()
text = compiled.as_text()

# pool leaf shapes: K/V int8 [L, pool_rows, f]; scales f32 [L, pool_rows, sw]
f = cfg.num_kv_heads * cfg.head_dim
pool_shapes = [f"s8[{cfg.num_layers},{pool_rows},{f}]",
               f"f32[{cfg.num_layers},{pool_rows},"]
copies = [ln.strip() for ln in text.splitlines()
          if re.search(r"=\s*\S*\s*copy\(", ln)]
print(f"total copy ops: {len(copies)}")
pool_copies = [c for c in copies if any(s in c for s in pool_shapes)]
print(f"pool-shaped copy ops: {len(pool_copies)}")
for c in pool_copies[:12]:
    print("  ", c[:160])
# also look for full-pool-shaped fusions that output a fresh pool buffer
# (scatter rewritten as select/pad would show as pool-shaped fusion outputs)
fusion_pool = [ln.strip() for ln in text.splitlines()
               if ("fusion(" in ln or "scatter(" in ln or "dynamic-update" in ln)
               and any(s in ln for s in pool_shapes)]
print(f"pool-shaped scatter/dus/fusion ops: {len(fusion_pool)}")
for c in fusion_pool[:16]:
    print("  ", c[:200])
mem = compiled.memory_analysis()
print("temp bytes:", getattr(mem, "temp_size_in_bytes", None),
      "output bytes:", getattr(mem, "output_size_in_bytes", None),
      "arg bytes:", getattr(mem, "argument_size_in_bytes", None),
      "alias bytes:", getattr(mem, "alias_size_in_bytes", None))
