"""v5e-8 TRAIN feasibility certification (VERDICT r3 item 5).

AOT-compile (`.lower().compile()`) the FULL-GEOMETRY 13B SFT train step —
LLaMA2-13B hidden 5120 / 40 layers / LoRA-r32 / remat+scan, the agent's
resamplers, reference micro-batch 8 at seq 896 — over an 8-device virtual
CPU mesh at the real FSDP layouts (fsdp=8 and fsdp=4 x tensor=2), with
ABSTRACT sharded inputs (no buffers materialise; the partitioned program
is identical to the TPU one, only the backend differs — same method as
scratch/v5e8_collectives.py).  Record XLA's `memory_analysis()` per-chip
bytes vs the 16G v5e HBM, plus collective counts, for the PARITY.md
"v5e-8 train feasibility" row.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scratch/v5e8_train_aot.py
            -> DEVICELESS v5e 2x4 topology AOT (the real TPU compiler).
               Attention is forced to the XLA path for this compile: the
               deviceless compiler cannot partition jax custom_partitioning
               ops ("Custom emitter for CustomSPMDPartitioning not found",
               r4 session 2 at fsdp=4 x tensor=2; the fsdp=8 flash compile
               was SIGKILLed mid-compile after 44 min).  The XLA path
               materialises per-layer [B_shard, H, S, S] attention probs
               the TPU flash kernel never allocates — at B_shard=1, S=896,
               H=40 that is ~0.12 GiB f32 per live (rematted) layer, so
               the reported temp OVERSTATES the real flash program by a
               few tenths of a GiB: a fits-16G verdict here is conservative.
      PYTHONPATH=/root/repo python scratch/v5e8_train_aot.py --cpu
            -> virtual-8-CPU fallback (same XLA-attention overstatement,
               plus CPU-backend layouts; measured 18.3 GiB.  Kept only for
               environments without the TPU plugin.)

Reference training topology this certifies the analogue of:
/root/reference/configs/accelerate/stage3_fp16_dp.json:18-29 (ZeRO-3 over
8 GPUs) + scripts/train_seed_x_sft_comp_gen.sh:19-36 (micro-batch 8).
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

USE_CPU = "--cpu" in sys.argv
if USE_CPU:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8").strip()

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import NamedSharding, PartitionSpec as P

if USE_CPU:
    jax.config.update("jax_platforms", "cpu")
    TOPO_DEVICES = None
else:
    from jax.experimental import topologies

    TOPO_DEVICES = topologies.get_topology_desc(
        platform="tpu", topology_name="v5e:2x4").devices
    assert len(TOPO_DEVICES) == 8, TOPO_DEVICES

from seedx_tpu.models.agent import AgentConfig, ContinuousLVLM
from seedx_tpu.models.llama import llama2_13b
from seedx_tpu.parallel import create_mesh
from seedx_tpu.parallel.mesh import DEFAULT_RULES, mesh_sharding
from seedx_tpu.train.partition import path_labels, split_params
from seedx_tpu.train.trainer import (TrainConfig, create_train_state,
                                     make_train_step)

GIB = 1024 ** 3


def count_collectives(compiled):
    txt = compiled.as_text()
    out = {}
    for op in ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all"):
        starts = re.findall(rf"(\S+) = \S* ?{op}\(", txt)
        shapes = re.findall(rf"= (\w+)\[([\d,]*)\][^=]*? {op}\(", txt)
        nbytes = 0
        for dt, dims in shapes:
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            sz = {"bf16": 2, "f32": 4, "s8": 1, "u8": 1, "s32": 4,
                  "f16": 2, "pred": 1}.get(dt, 2)
            nbytes += n * sz
        if starts:
            out[op] = (len(starts), round(nbytes / 1e6, 1))
    return out


def abstract(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)


def with_shardings(abs_tree, shard_tree):
    return jax.tree.map(
        lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s),
        abs_tree, shard_tree)


def opt_state_shardings(mesh, abs_opt, abs_trainable, trainable_shardings):
    """optax state leaves mirror the trainable tree in flatten order (adam
    mu/nu are tree_maps of it); scalars (count, schedule step) replicate."""
    tr_abs = jax.tree.leaves(abs_trainable)
    tr_sh = jax.tree.leaves(trainable_shardings)
    leaves, treedef = jax.tree.flatten(abs_opt)
    out, i = [], 0
    for lf in leaves:
        if lf.ndim == 0:
            out.append(NamedSharding(mesh, P()))
        else:
            ref = tr_abs[i % len(tr_abs)]
            assert lf.shape == ref.shape, (lf.shape, ref.shape)
            out.append(tr_sh[i % len(tr_sh)])
            i += 1
    assert i % len(tr_abs) == 0, (i, len(tr_abs))
    return jax.tree.unflatten(treedef, out)


def tree_bytes(tree):
    return sum(int(np.prod(x.shape)) * x.dtype.itemsize
               for x in jax.tree.leaves(tree))


def certify(fsdp: int, tensor: int, batch_size: int = 8, seq: int = 896,
            n_imgs: int = 8, vit_tokens: int = 256, attn: str = "auto"):
    import time
    t0 = time.time()
    mesh = create_mesh(data=1, fsdp=fsdp, tensor=tensor,
                       devices=TOPO_DEVICES)
    llm_cfg = llama2_13b(lora_rank=32, param_dtype=jnp.bfloat16,
                         attention_impl=attn,
                         vocab_pad_to=32336 if tensor > 1 else 0)
    cfg = AgentConfig(llm=llm_cfg)
    model = ContinuousLVLM(cfg)
    train_cfg = TrainConfig(max_steps=20000, warmup_steps=500)

    ids = jax.ShapeDtypeStruct((batch_size, seq), jnp.int32)
    amask = jax.ShapeDtypeStruct((batch_size, seq), jnp.bool_)
    labels = jax.ShapeDtypeStruct((batch_size, seq), jnp.int32)
    img = jax.ShapeDtypeStruct((n_imgs, vit_tokens, cfg.vit_dim),
                               jnp.bfloat16)
    emask = jax.ShapeDtypeStruct((n_imgs,), jnp.bool_)
    imask = jax.ShapeDtypeStruct((batch_size, seq), jnp.bool_)
    ppos = jax.ShapeDtypeStruct((n_imgs, 2), jnp.float32)

    def init_fn(rng, ids, attn, labels, img, emask, imask, ppos):
        return model.init(rng, ids, attn, labels, img, emask, emask,
                          imask, imask, ppos, method="init_all")

    boxed = jax.eval_shape(init_fn, jax.random.PRNGKey(0), ids, amask,
                           labels, img, emask, imask, ppos)
    param_shardings = nn.logical_to_mesh_sharding(
        nn.get_partition_spec(boxed["params"]), mesh, DEFAULT_RULES)
    abs_params = nn.meta.unbox(boxed["params"])

    def build_state(params):
        return create_train_state(params, train_cfg)

    abs_state, abs_frozen = jax.eval_shape(build_state, abs_params)
    labels_tree = path_labels(abs_params, train_cfg.trainable_patterns)
    tr_sh, fr_sh = split_params(param_shardings, labels_tree)
    abs_tr, _ = split_params(abs_params, labels_tree)
    opt_sh = opt_state_shardings(mesh, abs_state.opt_state, abs_tr, tr_sh)
    state_in = type(abs_state)(
        step=jax.ShapeDtypeStruct((), jnp.int32,
                                  sharding=NamedSharding(mesh, P())),
        trainable=with_shardings(abs_state.trainable, tr_sh),
        opt_state=with_shardings(abs_state.opt_state, opt_sh),
        tx=abs_state.tx)
    frozen_in = with_shardings(abs_frozen, fr_sh)

    bsh = mesh_sharding(mesh, "batch", None)
    ish = mesh_sharding(mesh, "images", None, None)
    batch_in = dict(
        input_ids=jax.ShapeDtypeStruct(ids.shape, ids.dtype, sharding=bsh),
        attention_mask=jax.ShapeDtypeStruct(amask.shape, amask.dtype,
                                            sharding=bsh),
        labels=jax.ShapeDtypeStruct(labels.shape, labels.dtype,
                                    sharding=bsh),
        image_embeds=jax.ShapeDtypeStruct(img.shape, img.dtype,
                                          sharding=ish),
        embeds_gen_mask=jax.ShapeDtypeStruct(
            emask.shape, emask.dtype, sharding=mesh_sharding(mesh, "images")),
        embeds_cmp_mask=jax.ShapeDtypeStruct(
            emask.shape, emask.dtype, sharding=mesh_sharding(mesh, "images")),
        ids_gen_mask=jax.ShapeDtypeStruct(imask.shape, imask.dtype,
                                          sharding=bsh),
        ids_cmp_mask=jax.ShapeDtypeStruct(imask.shape, imask.dtype,
                                          sharding=bsh),
        patch_positions=jax.ShapeDtypeStruct(
            ppos.shape, ppos.dtype,
            sharding=mesh_sharding(mesh, "images", None)),
    )
    rng_in = jax.ShapeDtypeStruct((2,), jnp.uint32,
                                  sharding=NamedSharding(mesh, P()))

    train_step = make_train_step(model, train_cfg)
    with mesh:
        print(f"[{time.time()-t0:.0f}s] lowering fsdp={fsdp} "
              f"tensor={tensor} attn={attn} ...", flush=True)
        lowered = train_step.lower(state_in, frozen_in, batch_in, rng_in)
        print(f"[{time.time()-t0:.0f}s] lowered; compiling ...", flush=True)
        compiled = lowered.compile()
        print(f"[{time.time()-t0:.0f}s] compiled", flush=True)
    ma = compiled.memory_analysis()
    per_chip = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
    n_tr = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(abs_tr))
    report = dict(
        layout=f"fsdp={fsdp} tensor={tensor}",
        batch=batch_size, seq=seq,
        trainable_params_m=round(n_tr / 1e6, 1),
        frozen_bytes_total_gib=round(tree_bytes(abs_frozen) / GIB, 2),
        arg_gib=round(ma.argument_size_in_bytes / GIB, 2),
        temp_gib=round(ma.temp_size_in_bytes / GIB, 2),
        out_gib=round(ma.output_size_in_bytes / GIB, 2),
        alias_gib=round(ma.alias_size_in_bytes / GIB, 2),
        peak_per_chip_gib=round(per_chip / GIB, 2),
        fits_16g=bool(per_chip < 16 * GIB),
        collectives=count_collectives(compiled),
    )
    print("TRAIN_AOT", report, flush=True)
    return report


if __name__ == "__main__":
    # deviceless topology compiles REQUIRE the XLA attention path (see
    # module docstring); --flash-attn opts back in for future toolchains
    attn = "auto" if "--flash-attn" in sys.argv else "xla"
    if "--tp" in sys.argv:
        certify(fsdp=4, tensor=2, attn=attn)
    else:
        certify(fsdp=8, tensor=1, attn=attn)
        if "--one" not in sys.argv:
            certify(fsdp=4, tensor=2, attn=attn)
