"""Mesh/sharding tests on the 8-device virtual CPU mesh — the substitute for
the multi-node testing the reference lacks entirely (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec

from seedx_tpu.parallel import (DEFAULT_RULES, create_mesh, mesh_sharding,
                                shard_pytree, unbox)
from seedx_tpu.parallel.mesh import sharding_of


def test_mesh_creation():
    assert jax.device_count() == 8
    mesh = create_mesh(data=2, fsdp=4, tensor=1)
    assert mesh.shape == {"data": 2, "fsdp": 4, "tensor": 1}
    mesh = create_mesh()  # infer fsdp
    assert mesh.shape["fsdp"] == 8


def test_mesh_sharding_spec(mesh8):
    # batch consumes both data+fsdp; embed can then NOT reuse fsdp in the
    # same spec (one mesh axis shards at most one dim of an array).
    s = mesh_sharding(mesh8, "batch", None, "embed")
    assert s.spec == PartitionSpec(("data", "fsdp"), None, None)
    # params (no batch dim): embed -> fsdp
    s2 = mesh_sharding(mesh8, "vocab", "embed")
    assert s2.spec == PartitionSpec("tensor", "fsdp")


def test_shard_llama_params_fsdp(mesh8):
    from seedx_tpu.models.llama import LlamaForCausalLM, llama_debug

    cfg = llama_debug(hidden_size=128, intermediate_size=256, num_layers=2,
                      num_heads=4, num_kv_heads=4)
    model = LlamaForCausalLM(cfg)
    ids = jnp.zeros((2, 16), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(16), (2, 16))
    variables = model.init(jax.random.PRNGKey(0), ids, positions,
                           method="init_all")
    params = shard_pytree(variables["params"], mesh8)
    # embedding [vocab, embed]: embed dim sharded over fsdp(8)
    emb = params["embed_tokens"]["embedding"]
    assert emb.sharding.spec == PartitionSpec("tensor", "fsdp")
    # q_proj kernel stacked over layers: [layers, embed, heads]
    qk = params["model"]["layers"]["layer"]["q_proj"]["kernel"]
    assert qk.sharding.spec == PartitionSpec(None, "fsdp", "tensor")

    # jitted forward with sharded params runs and matches unsharded
    embeds_fn = lambda p: model.apply({"params": p}, ids, method="embed")
    ref = embeds_fn(unbox(variables["params"]))
    out = jax.jit(embeds_fn)(params)
    np.testing.assert_allclose(np.asarray(ref, np.float32),
                               np.asarray(out, np.float32))


def test_sharded_agent_forward(mesh8, tiny_agent):
    """Agent loss computed with FSDP-sharded params == replicated result."""
    model, variables = tiny_agent
    B, S, N, T = 2, 80, 2, 256
    rng = jax.random.PRNGKey(1)
    ids = jax.random.randint(rng, (B, S), 0, 300)
    attn = jnp.ones((B, S), bool)
    labels = jnp.where(attn, ids, -100)
    image_embeds = jax.random.normal(rng, (N, T, 64), jnp.bfloat16)
    embeds_cmp = jnp.array([True, False])
    embeds_gen = jnp.array([False, True])
    ids_cmp = jnp.zeros((B, S), bool).at[0, 1:65].set(True)
    ids_gen = jnp.zeros((B, S), bool).at[1, 2:66].set(True)
    patch_pos = jnp.full((N, 2), 0.5)

    ref = model.apply(variables, ids, attn, labels, image_embeds, embeds_gen,
                      embeds_cmp, ids_gen, ids_cmp, patch_pos)

    params = shard_pytree(variables["params"], mesh8)

    @jax.jit
    def loss_fn(p):
        out = model.apply({"params": p}, ids, attn, labels, image_embeds,
                          embeds_gen, embeds_cmp, ids_gen, ids_cmp, patch_pos)
        return out["total_loss"]

    sharded_loss = loss_fn(params)
    assert abs(float(sharded_loss) - float(ref["total_loss"])) < 1e-2


def test_sharding_of_matches_shard_pytree(mesh8, tiny_agent):
    model, variables = tiny_agent
    shardings = sharding_of(variables["params"], mesh8)
    placed = shard_pytree(variables["params"], mesh8)
    flat_s = jax.tree.leaves(shardings)
    flat_p = jax.tree.leaves(placed)
    for s, p in zip(flat_s, flat_p):
        assert p.sharding == s


def test_tensor_parallel_agent_forward(tiny_agent):
    """fsdp x tensor 2D layout: loss matches the replicated result."""
    from seedx_tpu.parallel import create_mesh

    mesh = create_mesh(data=1, fsdp=4, tensor=2)
    model, variables = tiny_agent
    B, S, N, T = 2, 80, 2, 256
    rng = jax.random.PRNGKey(1)
    ids = jax.random.randint(rng, (B, S), 0, 300)
    attn = jnp.ones((B, S), bool)
    labels = jnp.where(attn, ids, -100)
    image_embeds = jax.random.normal(rng, (N, T, 64), jnp.bfloat16)
    embeds_cmp = jnp.array([True, False])
    embeds_gen = jnp.array([False, True])
    ids_cmp = jnp.zeros((B, S), bool).at[0, 1:65].set(True)
    ids_gen = jnp.zeros((B, S), bool).at[1, 2:66].set(True)
    patch_pos = jnp.full((N, 2), 0.5)

    ref = model.apply(variables, ids, attn, labels, image_embeds, embeds_gen,
                      embeds_cmp, ids_gen, ids_cmp, patch_pos)
    params = shard_pytree(variables["params"], mesh)
    # verify a projection kernel is 2D-sharded (stacked: layers, embed, heads)
    qk = params["llm"]["model"]["layers"]["layer"]["q_proj"]["kernel"]
    assert qk.sharding.spec == PartitionSpec(None, "fsdp", "tensor")

    with mesh:
        @jax.jit
        def loss_fn(p):
            out = model.apply({"params": p}, ids, attn, labels, image_embeds,
                              embeds_gen, embeds_cmp, ids_gen, ids_cmp,
                              patch_pos)
            return out["total_loss"]

        tp_loss = loss_fn(params)
    assert abs(float(tp_loss) - float(ref["total_loss"])) < 2e-2


def test_sharded_runtime_inference_matches_single():
    """SeedXRuntime.shard() places params on a fsdp x tensor mesh; greedy
    generation must produce the same tokens as the unsharded runtime."""
    from jax.sharding import PartitionSpec
    from PIL import Image

    from seedx_tpu.inference.runtime import SeedXRuntime
    from seedx_tpu.parallel import create_mesh

    rng = np.random.RandomState(3)
    image = Image.fromarray(rng.randint(0, 255, (60, 60, 3), np.uint8))

    from seedx_tpu.inference import apps

    rt = SeedXRuntime.debug(image_size=56)
    ref = apps.comprehend(rt, image, "what?", max_new_tokens=4)

    rt2 = SeedXRuntime.debug(image_size=56)
    mesh = create_mesh(data=1, fsdp=4, tensor=2)
    rt2.shard(mesh)
    assert rt2.mesh is mesh
    # the flash kernel partitions natively now (custom_partitioning);
    # no attention fallback happens on multi-device meshes
    assert rt2.agent_cfg.llm.attention_impl == "auto"
    qk = rt2.agent_params["llm"]["model"]["layers"]["layer"]["q_proj"]["kernel"]
    assert qk.sharding.spec == PartitionSpec(None, "fsdp", "tensor")

    out = apps.comprehend(rt2, image, "what?", max_new_tokens=4)
    assert list(out["tokens"]) == list(ref["tokens"])


def test_sharded_sdxl_denoise_matches_single():
    """SDXLAdapter.shard(): the denoise runs SPMD — latent rows over the
    ``tensor`` axis (GSPMD conv halos), CFG branches over ``data`` — and must
    reproduce the single-device images (reference runs the whole denoise on
    one GPU, pipeline_stable_diffusion_xl_t2i_edit.py:900-963)."""
    from PIL import Image

    from seedx_tpu.inference.runtime import SeedXRuntime
    from seedx_tpu.parallel import create_mesh

    rng = np.random.RandomState(5)
    image = Image.fromarray(rng.randint(0, 255, (60, 60, 3), np.uint8))

    rt = SeedXRuntime.debug(with_adapter=True)
    embeds = rt.encode_image_single(image)
    ref = rt.adapter.generate(embeds, from_vit=True, num_inference_steps=3)

    rt2 = SeedXRuntime.debug(with_adapter=True)
    mesh = create_mesh(data=1, fsdp=1, tensor=8)
    # adapter-only shard: the agent's vocab (32330 = 2*5*53*61) limits the
    # tensor axis to {2, 5} — the image side has no such constraint, so a
    # serving slice can give SDXL all 8 devices on `tensor`.
    rt2.adapter.shard(mesh)
    assert rt2.adapter.mesh is mesh
    embeds2 = rt2.encode_image_single(image)
    out = rt2.adapter.generate(embeds2, from_vit=True, num_inference_steps=3)

    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-2)


def test_tensor8_llm_with_padded_vocab():
    """vocab_pad_to=32336 unlocks tensor=8 for the vocab-sharded embedding
    and lm_head (32330 itself is only divisible by 2 and 5); logits must
    match the unsharded padded model."""
    from seedx_tpu.models.llama import LlamaForCausalLM, llama_debug

    cfg = llama_debug(hidden_size=128, intermediate_size=256, num_layers=2,
                      num_heads=8, num_kv_heads=8, vocab_pad_to=32336)
    model = LlamaForCausalLM(cfg)
    B, S = 2, 12
    ids = jax.random.randint(jax.random.PRNGKey(2), (B, S), 0,
                             cfg.vocab_size)
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    variables = model.init(jax.random.PRNGKey(0), ids, positions,
                           method="init_all")

    def fwd(p):
        emb = model.apply({"params": p}, ids, method="embed")
        logits, _, _ = model.apply({"params": p}, emb, positions)
        return logits

    ref = fwd(unbox(variables["params"]))

    mesh = create_mesh(data=1, fsdp=1, tensor=8)
    params = shard_pytree(variables["params"], mesh)
    emb_table = params["embed_tokens"]["embedding"]
    assert emb_table.sharding.spec == PartitionSpec("tensor", "fsdp")
    with mesh:
        out = jax.jit(fwd)(params)
    np.testing.assert_allclose(np.asarray(ref, np.float32),
                               np.asarray(out, np.float32), atol=2e-2)


def test_sharded_continuous_engine_matches_single():
    """The continuous-batching engine on a sharded runtime: slot-pool
    decode, rolling admission, and image-span features all run SPMD (the
    engine's jitted programs inherit layouts from the sharded params) and
    must reproduce the unsharded engine's results token-for-token.  The
    reference serves eager single-GPU only (SURVEY.md §2a row 6); SPMD
    continuous serving is a beyond-parity extra, certified here."""
    from seedx_tpu.inference.continuous import ContinuousEngine
    from seedx_tpu.inference.runtime import SeedXRuntime
    from seedx_tpu.text import prompts

    def requests(rt):
        t2i = prompts.generation_prompt("a red boat")
        ids1 = [rt.tokenizer.bos_token_id] + rt.tokenizer.encode(t2i)
        ids2 = [rt.tokenizer.bos_token_id] + rt.tokenizer.encode("hi there")
        base = {"image_embeds": None, "embeds_cmp_mask": None,
                "ids_cmp_mask": None, "patch_positions": None}
        return [dict(base, input_ids=ids1), dict(base, input_ids=ids2),
                dict(base, input_ids=ids2 + ids2[1:])]

    def drain(rt):
        eng = ContinuousEngine(rt, slots=2, max_new_tokens=6, chunk_steps=3,
                               prompt_buckets=(64,))
        ids = [eng.submit(r) for r in requests(rt)]
        results = eng.run()
        return [results[i] for i in ids]

    rt = SeedXRuntime.debug(image_size=56)
    refs = drain(rt)

    rt2 = SeedXRuntime.debug(image_size=56)
    rt2.shard(create_mesh(data=1, fsdp=4, tensor=2))
    outs = drain(rt2)

    for out, ref in zip(outs, refs):
        assert list(out["tokens"]) == list(ref["tokens"])
        assert out["has_img_output"] == ref["has_img_output"]
        if ref["img_gen_feat"] is not None:
            a = np.asarray(out["img_gen_feat"], np.float32)
            r = np.asarray(ref["img_gen_feat"], np.float32)
            rel = np.abs(a - r).max() / (np.abs(r).max() + 1e-9)
            assert rel < 5e-2, rel
