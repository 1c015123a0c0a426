"""Two-process validation worker (spawned by tests/test_multiprocess.py).

Exercises the repo's multi-HOST story over two coordinated local CPU
processes — the surface the reference "tests" only via a commented
torchrun line (reference: scripts/train_seed_x_sft_comp_gen.sh:9 and
Accelerate's process-group init, src/train/train_seed_x_sft.py:147-156):

  * ``parallel.distributed.maybe_initialize()`` from coordinator env vars,
  * per-host file sharding (``data/pipeline.shard_files``): disjoint and
    complete across processes,
  * the sharded train step on a global ('data','fsdp','tensor') mesh
    spanning both processes, with the batch assembled from per-host local
    shards (``train_sft._to_device`` -> ``put_global``),
  * orbax checkpoint save + restore ACROSS the process boundary, and a
    further train step from the restored state.

Each process prints one ``METRICS`` line and one ``MULTIPROC OK`` line;
the spawning test asserts both processes agree bit-for-bit (SPMD).

Not named test_*: pytest must not collect it — it only makes sense under
the coordinator env (JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/
JAX_PROCESS_ID, JAX_PLATFORMS=cpu, 2 host devices per process).
"""

import json
import os
import sys

import numpy as np


def main(out_dir: str) -> None:
    from seedx_tpu.parallel.distributed import maybe_initialize

    maybe_initialize()

    import jax
    import jax.numpy as jnp

    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 2, jax.local_device_count()
    assert jax.device_count() == 4, jax.device_count()
    pid = jax.process_index()

    # --- per-host file sharding: disjoint + complete ----------------------
    from seedx_tpu.data.pipeline import shard_files

    files = [f"shard-{i:03d}" for i in range(7)]
    mine = shard_files(files)
    assert mine == files[pid::2], (pid, mine)

    # --- tiny agent + global mesh over both processes ---------------------
    from seedx_tpu.models.agent import AgentConfig, ContinuousLVLM
    from seedx_tpu.models.llama import llama_debug
    from seedx_tpu.parallel import create_mesh, shard_pytree
    from seedx_tpu.parallel.mesh import mesh_sharding
    from seedx_tpu.train.train_sft import _to_device
    from seedx_tpu.train.trainer import (TrainConfig, create_train_state,
                                         make_train_step)

    llm_cfg = llama_debug(hidden_size=128, intermediate_size=256,
                          num_layers=2, num_heads=4, num_kv_heads=4,
                          lora_rank=8)
    cfg = AgentConfig(llm=llm_cfg, vit_dim=64, resampler_heads=4,
                      num_img_in_tokens=4, num_img_out_tokens=4)
    model = ContinuousLVLM(cfg)

    # Deterministic GLOBAL batch (both hosts build the same one, then each
    # keeps only its rows — emulating disjoint per-host streams).
    B, S, N, T = 4, 64, 4, 16   # vit_down pools T=16 -> 4 target tokens
    rng = np.random.RandomState(7)
    ids = rng.randint(5, 30000, (B, S)).astype(np.int32)
    attn = np.ones((B, S), bool)
    labels = np.where(attn, ids, -100).astype(np.int32)
    image_embeds = rng.randn(N, T, cfg.vit_dim).astype(np.float32) * 0.1
    embeds_cmp = np.array([True, True, False, False])
    embeds_gen = ~embeds_cmp
    ids_cmp = np.zeros((B, S), bool)
    ids_cmp[0, 1:5] = True
    ids_cmp[1, 3:7] = True
    ids_gen = np.zeros((B, S), bool)
    ids_gen[2, 2:6] = True
    ids_gen[3, 5:9] = True
    patch_pos = np.full((N, 2), 0.5, np.float32)
    global_batch = dict(
        input_ids=ids, attention_mask=attn, labels=labels,
        image_embeds=image_embeds, embeds_gen_mask=embeds_gen,
        embeds_cmp_mask=embeds_cmp, ids_gen_mask=ids_gen,
        ids_cmp_mask=ids_cmp, patch_positions=patch_pos)
    rows = slice(pid * 2, pid * 2 + 2)   # this host's data shard
    local_batch = {k: v[rows] for k, v in global_batch.items()}

    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(attn),
        jnp.asarray(labels), jnp.asarray(image_embeds),
        jnp.asarray(embeds_gen), jnp.asarray(embeds_cmp),
        jnp.asarray(ids_gen), jnp.asarray(ids_cmp),
        jnp.asarray(patch_pos), method="init_all")

    mesh = create_mesh(data=1, fsdp=4, tensor=1)
    with mesh:
        params = shard_pytree(variables["params"], mesh)
        train_cfg = TrainConfig(max_steps=4, warmup_steps=1)
        state, frozen = create_train_state(params, train_cfg)
        train_step = make_train_step(model, train_cfg)

        dbatch = _to_device(local_batch, mesh)
        state, m1 = train_step(state, frozen, dbatch, jax.random.PRNGKey(1))
        state, m2 = train_step(state, frozen, dbatch, jax.random.PRNGKey(2))
        m1 = {k: float(v) for k, v in m1.items()}
        m2 = {k: float(v) for k, v in m2.items()}
        print(f"METRICS {json.dumps([m1, m2], sort_keys=True)}", flush=True)

        # --- orbax across the process boundary ----------------------------
        from seedx_tpu.train.checkpoints import CheckpointManager

        ckpt = CheckpointManager(os.path.join(out_dir, "ckpts"))
        ckpt.save(2, state, wait=True)
        restored = ckpt.restore(template=state)

        repl = mesh_sharding(mesh)   # fully replicated scalar

        def max_diff(a, b):
            leaves = [
                jnp.max(jnp.abs(x.astype(jnp.float32)
                                - y.astype(jnp.float32)))
                for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))]
            return jnp.max(jnp.stack(leaves))

        md = float(jax.jit(max_diff, out_shardings=repl)(state, restored))
        assert md == 0.0, f"restore mismatch: max diff {md}"

        # the restored state must be live-usable: one more step
        state3, m3 = train_step(restored, frozen, dbatch,
                                jax.random.PRNGKey(3))
        m3 = {k: float(v) for k, v in m3.items()}
        ckpt.close()
    print(f"MULTIPROC OK {json.dumps(m3, sort_keys=True)}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
