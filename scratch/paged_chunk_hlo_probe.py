"""Optimized-HLO copy census of the REAL paged `_decode_chunk`.

paged_hlo_probe.py showed the per-layer pool scatters compile in-place for a
single bare llm_step.  The production path nests that step inside
`_decode_chunk`'s `lax.while_loop` — this probe compiles the actual engine
chunk (tiny int4 debug geometry, CPU) and counts pool-shaped `copy` ops in
the optimized HLO.  Copy insertion is a backend-shared pass, so a pool copy
here is evidence for the TPU slowdown too (NOTES_r3 open item 2).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import re
import types

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from flax import linen as nn

from seedx_tpu.inference.continuous import ContinuousEngine, _decode_chunk
from seedx_tpu.models.agent import AgentConfig, ContinuousLVLM
from seedx_tpu.models.llama import llama_debug
from seedx_tpu.ops import int4_matmul as int4_mod
from seedx_tpu.text.tokenizer import ByteFallbackTokenizer

int4_mod.FORCE_KERNEL = True

llm_cfg = llama_debug(hidden_size=128, intermediate_size=256, num_layers=2,
                      num_heads=4, num_kv_heads=4, quantization="int4",
                      kv_quantization="int8", stacked_decode="force",
                      decode_attention="force", remat=False)
agent_cfg = AgentConfig(llm=llm_cfg, vit_dim=64, resampler_heads=4,
                        num_img_in_tokens=64, num_img_out_tokens=4,
                        vit_down=False)
model = ContinuousLVLM(agent_cfg)
ids = jnp.zeros((1, 8), jnp.int32)
attn = jnp.ones((1, 8), bool)
img = jnp.zeros((1, 4, 64), jnp.bfloat16)
fmask = jnp.zeros((1,), bool)
idsm = jnp.zeros((1, 8), bool)
shapes = nn.meta.unbox(jax.eval_shape(
    lambda: model.init(jax.random.PRNGKey(0), ids, attn,
                       jnp.where(attn, ids, -100), img, fmask, fmask,
                       idsm, idsm, jnp.full((1, 2), 0.5),
                       method="init_all"))["params"])


def fill(path, x):
    key = jax.random.PRNGKey(hash(str(path)) % (2 ** 31))
    if x.dtype == jnp.int8:
        return jax.random.randint(key, x.shape, -127, 128, jnp.int32
                                  ).astype(jnp.int8)
    if x.dtype == jnp.uint8:
        return jax.random.randint(key, x.shape, 0, 256, jnp.int32
                                  ).astype(jnp.uint8)
    return (jax.random.normal(key, x.shape, jnp.float32) * 0.02
            ).astype(x.dtype)


params = jax.jit(lambda: jax.tree_util.tree_map_with_path(fill, shapes))()
rt = types.SimpleNamespace(agent=model, agent_params=params,
                           agent_cfg=agent_cfg,
                           tokenizer=ByteFallbackTokenizer())

eng = ContinuousEngine(rt, slots=4, max_new_tokens=8, chunk_steps=4,
                       prompt_buckets=(16, 32), page_size=8, paged=True,
                       pool_tokens=64 * 8)

# Trace the chunk exactly as ContinuousEngine.step does.
lowered = _decode_chunk.lower(eng.model, eng.variables, eng.state,
                              eng.gen_cfg, eng.vocab, eng.chunk_steps,
                              eng._s_max)
compiled = lowered.compile()
text = compiled.as_text()

pool_rows = eng._pool_tiles * eng.page
f = llm_cfg.num_kv_heads * llm_cfg.head_dim
L = llm_cfg.num_layers
pool_sig = [f"s8[{L},{pool_rows},{f}]", f"[{L},{pool_rows},"]
copies = [ln.strip() for ln in text.splitlines()
          if re.search(r"=\s*\S+\s+copy\(", ln)]
pool_copies = [c for c in copies if any(s in c for s in pool_sig)]
print(f"total copy ops: {len(copies)}; pool-shaped: {len(pool_copies)}")
for c in pool_copies[:12]:
    print("  COPY", c[:180])
scat = [ln.strip() for ln in text.splitlines()
        if ("scatter(" in ln or "dynamic-update-slice(" in ln)
        and any(s in ln for s in pool_sig)]
print(f"pool-shaped scatter/dus: {len(scat)}")
for c in scat[:8]:
    print("  ", c[:180])
