"""Test harness: an 8-device virtual CPU mesh — or the real chip.

The reference has no test suite at all (SURVEY.md §4); multi-node behaviour
was untested.  Here every test runs on ``XLA_FLAGS=--xla_force_host_platform_
device_count=8`` so mesh/sharding logic is exercised without a TPU pod —
set BEFORE jax import, hence this conftest.

Exception — the on-chip tier (VERDICT r3 item 3): selecting the ``tpu``
marker (``pytest -m tpu``, or env ``SEEDX_TPU_TESTS=1``) leaves the backend
alone so ``tests/test_tpu_onchip.py`` runs NON-interpret Mosaic kernels on
the real chip.  Off-TPU, tpu-marked tests auto-skip (hook below), so the
plain CPU suite never fails on them.
"""

import os
import sys


def _tpu_tier_selected() -> bool:
    if os.environ.get("SEEDX_TPU_TESTS"):
        return True
    argv = sys.argv
    for i, a in enumerate(argv):
        if a in ("-m", "--markexpr") and i + 1 < len(argv):
            if "tpu" in argv[i + 1]:
                return True
        elif a.startswith(("-m", "--markexpr=")) and "tpu" in a:
            return True
    return False


_TPU_TIER = _tpu_tier_selected()
if not _TPU_TIER:
    os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env may pin a TPU backend
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# A pytest plugin may have imported jax before this conftest ran; the config
# update still wins as long as no backend has been initialised yet.
if not _TPU_TIER:
    jax.config.update("jax_platforms", "cpu")
    # Persistent compilation cache: the smoke tier's wall-clock is dominated
    # by XLA:CPU compiles of the scan+remat models (35 min on a 1-core box);
    # with the cache warm the same programs deserialize in ms.  Keyed by HLO
    # fingerprint, so code changes recompile exactly what changed.  Disable
    # with SEEDX_TEST_CACHE=0 (or point it elsewhere with a path).
    # (Loading spews benign cpu_aot_loader E-logs about the
    # +prefer-no-scatter/+prefer-no-gather pseudo-features missing from the
    # host probe — compiler preferences, not ISA bits; pytest captures them.)
    _cache = os.environ.get("SEEDX_TEST_CACHE", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_test_cache"))
    if _cache not in ("0", "off"):
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """tpu-marked tests only run when the active backend IS a TPU —
    anywhere else they would exercise interpret mode, which the CPU suite
    already covers (tests/test_decode_attention.py etc.)."""
    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(reason="requires a real TPU backend "
                                   "(run: pytest -m tpu on the chip)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)

from seedx_tpu.models.agent import AgentConfig, ContinuousLVLM  # noqa: E402
from seedx_tpu.models.llama import llama_debug  # noqa: E402
from seedx_tpu.models.vit import ViTConfig  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """The suite has grown past what one XLA CPU process survives: with
    every module's jitted programs accumulated, the compiler segfaults deep
    into tests/test_sharding.py (reproducibly at ~78% of a full -q run;
    every module passes standalone).  Dropping the pjit/compilation caches
    at module teardown keeps the process small — subsequent modules simply
    recompile what they need."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def mesh8():
    from seedx_tpu.parallel import create_mesh

    return create_mesh(data=1, fsdp=8, tensor=1)


@pytest.fixture(scope="session")
def tiny_llm_cfg():
    return llama_debug(hidden_size=128, intermediate_size=256, num_layers=2,
                       num_heads=4, num_kv_heads=4)


@pytest.fixture(scope="session")
def tiny_agent_cfg(tiny_llm_cfg):
    return AgentConfig(llm=tiny_llm_cfg, vit_dim=64, resampler_heads=4)


@pytest.fixture(scope="session")
def tiny_vit_cfg():
    # width != output_dim so the attn-pool kv_proj exists (as in the real
    # model: 1664 != 4096)
    return ViTConfig(image_size=56, patch_size=14, width=48, layers=2,
                     heads=4, mlp_ratio=2.0, n_queries=4, output_dim=64,
                     pos_embed_len=16)


@pytest.fixture(scope="session")
def tiny_agent(tiny_agent_cfg):
    """(model, variables) with params initialised once per session."""
    model = ContinuousLVLM(tiny_agent_cfg)
    B, S, N, T = 2, 80, 2, 256
    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (B, S), 0, 300)
    attn = jnp.ones((B, S), bool)
    labels = jnp.where(attn, ids, -100)
    image_embeds = jax.random.normal(rng, (N, T, tiny_agent_cfg.vit_dim),
                                     jnp.bfloat16)
    embeds_cmp = jnp.array([True, False])
    embeds_gen = jnp.array([False, True])
    ids_cmp = jnp.zeros((B, S), bool).at[0, 1:65].set(True)
    ids_gen = jnp.zeros((B, S), bool).at[1, 2:66].set(True)
    patch_pos = jnp.full((N, 2), 0.5)
    variables = model.init(
        jax.random.PRNGKey(0), ids, attn, labels, image_embeds, embeds_gen,
        embeds_cmp, ids_gen, ids_cmp, patch_pos, method="init_all")
    return model, variables
