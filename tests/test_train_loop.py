"""End-to-end training integration: synthetic shards -> streaming pipeline ->
frozen ViT encode -> sharded agent train step -> checkpoint save/resume.

This is the full src/train/train_seed_x_sft.py flow on the virtual mesh."""

import io
import json
import tarfile

import jax
import numpy as np
import pytest
from PIL import Image

from seedx_tpu.data.datasets import build_caption_datapipes_with_pixels
from seedx_tpu.data.pipeline import ThreadPrefetcher
from seedx_tpu.data.transforms import get_transform
from seedx_tpu.models.agent import AgentConfig, ContinuousLVLM
from seedx_tpu.models.llama import llama_debug
from seedx_tpu.models.vit import ViTConfig, VisionTransformer
from seedx_tpu.parallel import create_mesh
from seedx_tpu.text.tokenizer import ByteFallbackTokenizer
from seedx_tpu.train.train_sft import RunConfig, train_loop
from seedx_tpu.train.trainer import TrainConfig


def _write_tar(path, n):
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            img = Image.fromarray(
                (np.random.RandomState(i).rand(460, 500, 3) * 255
                 ).astype(np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{i:05d}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            txt = f"caption {i}".encode()
            info = tarfile.TarInfo(f"{i:05d}.txt")
            info.size = len(txt)
            tf.addfile(info, io.BytesIO(txt))


@pytest.mark.slow
def test_full_train_loop_with_resume(tmp_path):
    tok = ByteFallbackTokenizer()
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    _write_tar(str(shard_dir / "s0.tar"), 16)

    image_size = 28
    vit_cfg = ViTConfig(image_size=image_size, patch_size=14, width=32,
                        layers=1, heads=2, mlp_ratio=2.0, n_queries=4,
                        output_dim=32, pos_embed_len=4)
    vit = VisionTransformer(vit_cfg, remat=False)
    vit_params = vit.init(
        jax.random.PRNGKey(0),
        np.zeros((1, image_size, image_size, 3), np.float32))["params"]

    llm_cfg = llama_debug(hidden_size=64, intermediate_size=128, num_layers=1,
                          num_heads=2, num_kv_heads=2, lora_rank=4)
    # ViT emits 4 queries; agent consumes/regresses 4-token spans, no pooling
    agent_cfg = AgentConfig(llm=llm_cfg, vit_dim=32, resampler_heads=2,
                            num_img_in_tokens=4, num_img_out_tokens=4,
                            vit_down=False)
    agent = ContinuousLVLM(agent_cfg)

    def data():
        return ThreadPrefetcher(build_caption_datapipes_with_pixels(
            str(shard_dir), tokenizer=tok,
            image_transform=get_transform("clip", keep_ratio=False,
                                          image_size=image_size),
            max_length=96, batch_size=2, cycle_count=4,
            resolution_grids=["1x1"], base_resolution=image_size,
            min_resolution=10, num_img_in_tokens=4, num_img_out_tokens=4))

    # init agent params via one synthetic batch
    batch = next(iter(data()))
    B, S = batch["input_ids"].shape
    n_img = batch["images"].shape[0]
    img_embeds = np.zeros((n_img, 4, 32), np.float32)
    agent_params = agent.init(
        jax.random.PRNGKey(0), batch["input_ids"], batch["attention_mask"],
        batch["labels"], img_embeds, batch["embeds_gen_mask"],
        batch["embeds_cmp_mask"], batch["ids_gen_mask"],
        batch["ids_cmp_mask"], batch["patch_positions"],
        method="init_all")["params"]

    mesh = create_mesh()
    train_cfg = TrainConfig(learning_rate=1e-3, warmup_steps=0, max_steps=3,
                            weight_decay=0.0)
    run_cfg = RunConfig(output_dir=str(tmp_path / "run"), save_steps=2,
                        log_steps=1)
    state = train_loop(agent, agent_params, vit, vit_params, data(),
                       train_cfg, run_cfg, mesh=mesh)
    assert int(state.step) == 3

    metrics = [json.loads(l) for l in
               open(tmp_path / "run" / "metrics.jsonl")]
    assert len(metrics) >= 2
    assert np.isfinite(metrics[-1]["total_loss"])
    # tensorboard tracker wrote event files next to the jsonl (reference:
    # train_seed_x_sft.py:147-156 log_with=['tensorboard', 'wandb'])
    tb_dir = tmp_path / "run" / "tb"
    assert tb_dir.is_dir()
    assert any(f.name.startswith("events.out.tfevents")
               for f in tb_dir.iterdir())

    # resume continues from the saved step
    train_cfg2 = TrainConfig(learning_rate=1e-3, warmup_steps=0, max_steps=5,
                             weight_decay=0.0)
    run_cfg2 = RunConfig(output_dir=str(tmp_path / "run"), save_steps=100,
                         log_steps=1, resume=True)
    state2 = train_loop(agent, agent_params, vit, vit_params, data(),
                        train_cfg2, run_cfg2, mesh=mesh)
    assert int(state2.step) == 5


@pytest.mark.slow
def test_train_loop_gradient_accumulation(tmp_path):
    """accum=2 stacks micro-batches on a scan axis; ViT folds the axis."""
    tok = ByteFallbackTokenizer()
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    _write_tar(str(shard_dir / "s0.tar"), 16)

    image_size = 28
    vit_cfg = ViTConfig(image_size=image_size, patch_size=14, width=32,
                        layers=1, heads=2, mlp_ratio=2.0, n_queries=4,
                        output_dim=32, pos_embed_len=4)
    vit = VisionTransformer(vit_cfg, remat=False)
    vit_params = vit.init(
        jax.random.PRNGKey(0),
        np.zeros((1, image_size, image_size, 3), np.float32))["params"]

    llm_cfg = llama_debug(hidden_size=64, intermediate_size=128, num_layers=1,
                          num_heads=2, num_kv_heads=2)
    agent_cfg = AgentConfig(llm=llm_cfg, vit_dim=32, resampler_heads=2,
                            num_img_in_tokens=4, num_img_out_tokens=4,
                            vit_down=False)
    agent = ContinuousLVLM(agent_cfg)

    data = ThreadPrefetcher(build_caption_datapipes_with_pixels(
        str(shard_dir), tokenizer=tok,
        image_transform=get_transform("clip", keep_ratio=False,
                                      image_size=image_size),
        max_length=96, batch_size=2, cycle_count=4,
        resolution_grids=["1x1"], base_resolution=image_size,
        min_resolution=10, num_img_in_tokens=4, num_img_out_tokens=4))

    batch = next(iter(data))
    n_img = batch["images"].shape[0]
    agent_params = agent.init(
        jax.random.PRNGKey(0), batch["input_ids"], batch["attention_mask"],
        batch["labels"], np.zeros((n_img, 4, 32), np.float32),
        batch["embeds_gen_mask"], batch["embeds_cmp_mask"],
        batch["ids_gen_mask"], batch["ids_cmp_mask"],
        batch["patch_positions"], method="init_all")["params"]

    train_cfg = TrainConfig(learning_rate=1e-3, warmup_steps=0, max_steps=2,
                            weight_decay=0.0, gradient_accumulation_steps=2)
    run_cfg = RunConfig(output_dir=str(tmp_path / "run"), save_steps=100,
                        log_steps=1)
    state = train_loop(agent, agent_params, vit, vit_params, data,
                       train_cfg, run_cfg, mesh=create_mesh())
    assert int(state.step) == 2


def test_metric_writers_jsonl_and_tensorboard(tmp_path):
    """MetricWriters fans one log() out to metrics.jsonl + tb events and
    survives unknown tracker names / non-scalar values."""
    import json as _json

    from seedx_tpu.utils.trackers import MetricWriters

    with MetricWriters(str(tmp_path), trackers=("jsonl", "tensorboard",
                                                "nosuch")) as w:
        w.log({"loss": 1.5, "lr": 1e-4}, step=0)
        w.log({"loss": 1.25, "note": "not-a-scalar"}, step=10)

    recs = [_json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert [r["step"] for r in recs] == [0, 10]
    assert recs[1]["note"] == "not-a-scalar"   # jsonl keeps everything

    tb_files = list((tmp_path / "tb").iterdir())
    assert tb_files and tb_files[0].stat().st_size > 0
