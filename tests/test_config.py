import textwrap

import pytest

from seedx_tpu.config import instantiate, instantiate_from_file, load_config


def test_instantiate_target():
    cfg = {"_target_": "collections.OrderedDict", "a": 1, "b": 2}
    out = instantiate(cfg)
    assert dict(out) == {"a": 1, "b": 2}


def test_instantiate_nested_and_overrides():
    cfg = {
        "_target_": "builtins.dict",
        "inner": {"_target_": "builtins.tuple"},
    }
    out = instantiate(cfg, extra=3)
    assert out == {"inner": (), "extra": 3}


def test_instantiate_non_recursive():
    cfg = {
        "_target_": "builtins.dict",
        "_recursive_": False,
        "inner": {"_target_": "builtins.tuple"},
    }
    out = instantiate(cfg)
    assert out["inner"] == {"_target_": "builtins.tuple"}


def test_instantiate_partial():
    cfg = {"_target_": "builtins.int", "_partial_": True}
    fn = instantiate(cfg)
    assert fn("42") == 42


def test_yaml_object_graph(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text(textwrap.dedent("""
        _target_: seedx_tpu.models.llama.llama_debug
        hidden_size: 64
        num_heads: 2
        num_kv_heads: 2
    """))
    cfg = instantiate_from_file(str(p))
    assert cfg.hidden_size == 64
    assert cfg.vocab_size == 32330


def test_resolve_errors():
    with pytest.raises(ImportError):
        instantiate({"_target_": "no.such.module.attr"})
