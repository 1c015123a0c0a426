"""SFT training driver — the ``src/train/train_seed_x_sft.py`` equivalent.

Orchestrates (reference: train_seed_x_sft.py:124-343):
  config graphs -> tokenizer/transform/ViT/agent -> FSDP mesh + sharded
  state -> streaming mixed data -> [frozen ViT encode -> jitted agent train
  step] loop -> metrics + periodic orbax checkpoints -> resume.

TPU-native differences:
  * the frozen ViT forward and the agent train step are two jitted programs
    over the same mesh (the reference also keeps the ViT outside its
    Accelerate engine, :189-197),
  * metrics are already global under SPMD — no all_gather
    (vs dist_utils.py:5-9),
  * checkpoint save/resume is orbax sharded state; the datapipe epoch
    reseeding trick (:256-269) is preserved via the seed offset.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from seedx_tpu import config as config_lib
from seedx_tpu.models.agent import ContinuousLVLM
from seedx_tpu.models.vit import VisionTransformer
from seedx_tpu.parallel import create_mesh, shard_pytree
from seedx_tpu.parallel.distributed import put_global
from seedx_tpu.parallel.mesh import mesh_sharding
from seedx_tpu.train.checkpoints import CheckpointManager
from seedx_tpu.train.trainer import (TrainConfig, TrainState,
                                     create_train_state, make_train_step)

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class RunConfig:
    output_dir: str = "runs/sft"
    save_steps: int = 1000
    log_steps: int = 10
    resume: bool = False
    seed: int = 42
    data_seed_per_epoch: bool = True
    # metric trackers (reference: train_seed_x_sft.py:147-156 log_with=
    # ['tensorboard', 'wandb']); jsonl is the tracker-agnostic record,
    # tensorboard events land under <output_dir>/tb/
    trackers: tuple = ("jsonl", "tensorboard")
    expr_name: str = ""


def make_vit_encode(vit: VisionTransformer):
    @jax.jit
    def encode(vit_params, images, patch_positions):
        # frozen forward (reference: train_seed_x_sft.py:293-299 no_grad)
        embeds = vit.apply({"params": vit_params}, images, patch_positions)
        return jax.lax.stop_gradient(embeds)

    return encode


def train_loop(
    agent: ContinuousLVLM,
    agent_params: Any,
    vit: Optional[VisionTransformer],
    vit_params: Any,
    data_iter: Iterator[Dict[str, np.ndarray]],
    train_cfg: TrainConfig,
    run_cfg: RunConfig,
    mesh=None,
) -> TrainState:
    mesh = mesh or create_mesh()
    os.makedirs(run_cfg.output_dir, exist_ok=True)
    ckpt = CheckpointManager(os.path.join(run_cfg.output_dir, "checkpoints"))

    from jax.sharding import NamedSharding, PartitionSpec, SingleDeviceSharding

    replicated = NamedSharding(mesh, PartitionSpec())

    def _commit(x):
        # Uncommitted/single-device leaves -> mesh-replicated; already-sharded
        # leaves keep their layout.  Keeps every train_step input committed
        # consistently so GSPMD never re-places donated state between steps.
        if hasattr(x, "sharding") and isinstance(x.sharding,
                                                 SingleDeviceSharding):
            return jax.device_put(x, replicated)
        return x

    with mesh:
        agent_params = shard_pytree(agent_params, mesh) \
            if _is_boxed(agent_params) else agent_params
        state, frozen = create_train_state(agent_params, train_cfg)
        state = jax.tree.map(_commit, state)
        frozen = jax.tree.map(_commit, frozen)
        resumed_step = 0
        if run_cfg.resume and ckpt.latest_step() is not None:
            restored = ckpt.restore(template=state)
            # re-place every leaf on its template sharding (orbax may restore
            # with the checkpoint-recorded placement instead)
            state = jax.tree.map(
                lambda t, r: jax.device_put(r, t.sharding)
                if hasattr(t, "sharding") else r, state, restored)
            resumed_step = int(state.step)
            logger.info("resumed from step %d", resumed_step)
        train_step = make_train_step(agent, train_cfg)
        vit_encode = make_vit_encode(vit) if vit is not None else None
        if vit_params is not None:
            vit_params = shard_pytree(vit_params, mesh) \
                if _is_boxed(vit_params) else jax.tree.map(_commit, vit_params)

        rng = jax.random.PRNGKey(run_cfg.seed)
        t_last = time.time()
        accum = train_cfg.gradient_accumulation_steps
        if resumed_step:
            # EXACT data resume: fast-forward the (deterministically seeded)
            # stream past every batch already trained on — the reference
            # only reseeds and replays (train_seed_x_sft.py:242-269)
            from seedx_tpu.data.pipeline import ResumableIterator

            data_iter = ResumableIterator(data_iter)
            skipped = data_iter.skip(resumed_step * accum)
            logger.info("data stream fast-forwarded %d batches", skipped)
        if accum > 1:
            # stack `accum` micro-batches on a leading scan axis
            # (reference: --gradient_accumulation_steps 2,
            # train_seed_x_sft.py:260-313 accumulate context)
            data_iter = _stack_microbatches(data_iter, accum)
        from seedx_tpu.utils.trackers import MetricWriters

        with MetricWriters(run_cfg.output_dir, trackers=run_cfg.trackers,
                           expr_name=run_cfg.expr_name) as writers:
            for batch in data_iter:
                step = int(state.step)
                if step >= train_cfg.max_steps:
                    break
                device_batch = _to_device(batch, mesh,
                                          accum_axis=accum > 1)
                if vit_encode is not None and "images" in device_batch:
                    images = device_batch.pop("images")
                    ppos = device_batch.get("patch_positions")
                    if accum > 1:   # fold the accum axis into one ViT pass
                        a, n = images.shape[:2]
                        embeds = vit_encode(
                            vit_params, images.reshape(a * n, *images.shape[2:]),
                            ppos.reshape(a * n, 2))
                        device_batch["image_embeds"] = embeds.reshape(
                            a, n, *embeds.shape[1:])
                    else:
                        device_batch["image_embeds"] = vit_encode(
                            vit_params, images, ppos)
                rng, sub = jax.random.split(rng)
                state, metrics = train_step(state, frozen, device_batch, sub)

                if step % run_cfg.log_steps == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    m["steps_per_sec"] = run_cfg.log_steps / max(
                        time.time() - t_last, 1e-9)
                    t_last = time.time()
                    writers.log(m, step)
                    logger.info("step %d: %s", step, m)
                if step > 0 and step % run_cfg.save_steps == 0:
                    ckpt.save(step, state)
        ckpt.save(int(state.step), state, wait=True)
    return state


def _stack_microbatches(it: Iterator[Dict[str, np.ndarray]], accum: int
                        ) -> Iterator[Dict[str, np.ndarray]]:
    """Group `accum` consecutive micro-batches into one stacked batch with a
    leading scan axis (consumed by the trainer's accumulation scan)."""
    group = []
    for b in it:
        group.append(b)
        if len(group) == accum:
            yield {k: np.stack([g[k] for g in group]) for k in group[0]}
            group = []


def _is_boxed(tree: Any) -> bool:
    from flax import linen as nn

    return any(isinstance(x, nn.Partitioned)
               for x in jax.tree.leaves(
                   tree, is_leaf=lambda x: isinstance(x, nn.Partitioned)))


def _to_device(batch: Dict[str, np.ndarray], mesh,
               accum_axis: bool = False) -> Dict[str, Any]:
    """Place a batch on the mesh: batch dims shard over (data, fsdp).  With
    ``accum_axis`` the leading dim is the accumulation scan axis and stays
    unsharded.

    Multi-process (2+ hosts): each host passes its LOCAL slice of the
    global batch (the per-host file sharding in data/pipeline.py already
    makes streams disjoint); ``put_global`` assembles the global array from
    the per-process shards.  Validated by tests/test_multiprocess.py over
    two coordinated CPU processes."""
    procs = jax.process_count()
    lead = [None] if accum_axis else []
    out = {}
    for k, v in batch.items():
        v = jnp.asarray(v)
        rest = v.ndim - len(lead) - 1
        if k in ("input_ids", "attention_mask", "labels", "ids_gen_mask",
                 "ids_cmp_mask"):
            sharding = mesh_sharding(mesh, *lead, "batch", *([None] * rest))
        elif k in ("images", "image_embeds", "patch_positions",
                   "embeds_gen_mask", "embeds_cmp_mask"):
            sharding = mesh_sharding(mesh, *lead, "images", *([None] * rest))
        else:
            sharding = None
        # replicate when the sharded dim doesn't divide the LOCAL batch
        # shards (tiny debug batches); production batches are divisible.
        if sharding is not None:
            axis = len(lead)
            spec_entry = sharding.spec[axis] if len(sharding.spec) > axis \
                else None
            shards = int(np.prod([mesh.shape[a] for a in
                                  jax.tree.leaves(spec_entry)])) \
                if spec_entry else 1
            local_shards = max(shards // procs, 1)
            if v.shape[axis] % local_shards:
                if procs > 1:
                    # replicating per-host data would silently break SPMD
                    # (every host holds DIFFERENT samples)
                    raise ValueError(
                        f"batch key {k!r} local dim {v.shape[axis]} does "
                        f"not divide the {local_shards} per-host shards")
                sharding = None
        out[k] = put_global(v, sharding) if sharding is not None else v
    return out


def main(argv=None):
    """CLI mirroring the reference's HfArgumentParser entry
    (train_seed_x_sft.py:32-75): YAML object-graph configs + flags."""
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--image_transform", required=True)
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--visual_encoder", required=True)
    p.add_argument("--agent_model", required=True)
    p.add_argument("--train_dataset", required=True)
    p.add_argument("--output_dir", default="runs/sft")
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--max_steps", type=int, default=20000)
    p.add_argument("--warmup_steps", type=int, default=500)
    p.add_argument("--min_lr_ratio", type=float, default=0.05)
    p.add_argument("--save_steps", type=int, default=1000)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--expr_name", default="",
                   help="experiment name for trackers (reference: "
                        "--expr_name)")
    p.add_argument("--trackers", default="jsonl,tensorboard",
                   help="comma list of metric writers: jsonl, tensorboard, "
                        "wandb (reference logs to tensorboard+wandb via "
                        "accelerate, train_seed_x_sft.py:147-156)")
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--parallel", default=None,
                   help="mesh layout YAML (configs/parallel/*.yaml); "
                        "default: all local devices on the fsdp axis — the "
                        "reference's ZeRO-3 analogue")
    args = p.parse_args(argv)

    from seedx_tpu.parallel.distributed import maybe_initialize

    maybe_initialize()
    transform = config_lib.instantiate_from_file(args.image_transform)
    tokenizer = config_lib.instantiate_from_file(args.tokenizer)
    vit, vit_params = config_lib.instantiate_from_file(args.visual_encoder)
    agent, agent_params = config_lib.instantiate_from_file(args.agent_model)
    data_cfg = config_lib.load_config(args.train_dataset)
    data_iter = config_lib.instantiate(
        data_cfg, tokenizer=tokenizer, image_transform=transform)

    train_cfg = TrainConfig(
        learning_rate=args.learning_rate, weight_decay=args.weight_decay,
        max_steps=args.max_steps, warmup_steps=args.warmup_steps,
        min_lr_ratio=args.min_lr_ratio,
        gradient_accumulation_steps=args.gradient_accumulation_steps)
    run_cfg = RunConfig(output_dir=args.output_dir,
                        save_steps=args.save_steps, resume=args.resume,
                        trackers=tuple(
                            t for t in args.trackers.split(",") if t),
                        expr_name=args.expr_name)
    mesh = (config_lib.instantiate_from_file(args.parallel)
            if args.parallel else None)
    train_loop(agent, agent_params, vit, vit_params, data_iter, train_cfg,
               run_cfg, mesh=mesh)


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
